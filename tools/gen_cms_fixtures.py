#!/usr/bin/env python3
"""Generator for CMS-shaped test fixtures. Deterministic (seed 42).

Default (no args): the committed 30-patient fixtures
(src/test/resources/cms/) — byte-identical across runs; shapes mirror
the columns the reference reads (cms_preprocess.py:11-16) with the dirt
patterns FIXTURES.md §A calls for: mixed/garbage dates, quote-wrapped
crosswalk values, trailing dots, stray whitespace, empty cells.

Scaled mode (--patients N --out DIR, N != 30): a clean ~N*33-claim
DE-SynPUF-shaped corpus for the leakage-parity run
(graft.examples.ReferenceParity <dir>): every patient enrolled
2008-2010, ~10% get a DRG-469/470 TJR claim in 2010 (the label year),
whose dx codes therefore leak into the 2010 feature block — the
BASELINE.md train-AUC→1.0 property at ~10^5-claim scale.
"""
import argparse
import csv
import random
import os

ap = argparse.ArgumentParser()
ap.add_argument("--patients", type=int, default=30)
ap.add_argument("--out", default=os.path.join(
    os.path.dirname(__file__), "..", "src", "test", "resources", "cms"))
args = ap.parse_args()

random.seed(42)
OUT = args.out
os.makedirs(OUT, exist_ok=True)

# ---- crosswalks ----------------------------------------------------------
# dx: ICD9 diagnosis → CCS category (5 distinct categories)
DX = [
    ("'71500'", "'201'"), ("'71590.'", "'201'"), ("'7160 '", "'202'"),
    ("' 71610'", "'202'"), ("'71620'", "'203'"), ("'4019'", "'204'"),
    ("'25000.'", "'205'"), ("'2724'", "'204'"), ("'71536'", "'201'"),
    ("''", "''"),  # empty row — exercises empty→'None' sentinel
]
# pcs: ICD9 procedure → CCS category (3 distinct categories)
PCS = [
    ("'8151'", "'152'"), ("'8152.'", "'152'"), ("'8154'", "'153'"),
    ("' 0066'", "'154'"), ("'3722'", "'154'"),
]

def write_xw(name, rows):
    with open(f"{OUT}/{name}.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["'ICD-9-CM CODE'", "'CCS CATEGORY'",
                    "'CCS CATEGORY DESCRIPTION'"])
        for code, ccs in rows:
            w.writerow([code, ccs, "'desc'"])

write_xw("dx", DX)
write_xw("pcs", PCS)

DX_CODES = ["71500", "71590", "7160", "71610", "71620", "4019", "25000",
            "2724", "71536", "99999"]  # 99999 = OOV
PCS_CODES = ["8151", "8152", "8154", "0066", "3722", "88888"]  # OOV tail

# ---- beneficiaries -------------------------------------------------------
N_PAT = args.patients
SCALED = N_PAT != 30
patients = [f"P{i:04d}" for i in range(N_PAT)]
with open(f"{OUT}/ben.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["DESYNPUF_ID", "SP_RA_OA", "BENE_BIRTH_DT",
                "BENE_SEX_IDENT_CD"])
    for i, p in enumerate(patients):
        # default: patients 0-19 have the RA/OA flag (1), 20-29 don't (2)
        # scaled: 90% flagged — the arthritis-cohort filter keeps ~0.9N
        sp = (1 if i % 10 != 9 else 2) if SCALED else (1 if i < 20 else 2)
        birth = f"{1930 + (i % 20)}{(i % 12) + 1:02d}{(i % 28) + 1:02d}"
        w.writerow([p, sp, birth, 1 + (i % 2)])

# ---- inpatient claims ----------------------------------------------------
# Patients 0-14: claims in all of 2008/2009/2010 (fully enrolled).
# Patients 15-17: missing one year. 18-19: only 2007/2011 (out of range).
# TJR (DRG 470): patient 0 in 2008 (claim dropped), patients 1-3 in 2010
# (label=1). Garbage dates sprinkled on extra rows.
rows = []
clm = 1000
def add_claim(p, date, drg, ndx=3, npcs=2, dx_pool=None, pcs_pool=None):
    global clm
    dxp = dx_pool if dx_pool is not None else DX_CODES
    pcp = pcs_pool if pcs_pool is not None else PCS_CODES
    dx = random.sample(dxp, min(ndx, len(dxp))) + [""] * (10 - ndx)
    pc = random.sample(pcp, min(npcs, len(pcp))) + [""] * (6 - npcs)
    rows.append([p, f"C{clm}", date, drg] + dx + pc)
    clm += 1

# Scaled-mode pools: background claims never carry the TJR procedure
# codes (CCS 152/153); the TJR claim does — reproducing the reference's
# leakage mechanism, where the 2010 feature block contains the very
# procedure that defines the label (BASELINE.md train-AUC→1.0 caveat).
BG_DX = ["4019", "25000", "2724", "99999"]
BG_PCS = ["0066", "3722", "88888"]
TJR_DX = ["71500", "71590", "7160", "71610", "71620", "71536"]
TJR_PCS = ["8151", "8152", "8154"]

if SCALED:
    # Clean fully-enrolled corpus; ~10 background claims/patient/year.
    # ~10% of patients get the 2010 TJR claim → label=1; its dx codes
    # sit inside the 2010 feature block (the leakage under test).
    for i, p in enumerate(patients):
        for y in (2008, 2009, 2010):
            for k in range(8 + (i + y) % 5):
                date = f"{y}{(k % 12) + 1:02d}{((i + k) % 28) + 1:02d}"
                drg = "001" if (i + k) % 2 == 0 else "123"
                add_claim(p, date, drg, dx_pool=BG_DX, pcs_pool=BG_PCS)
        if i % 10 == 3:
            tjr_drg = "470" if i % 20 == 3 else "469"
            add_claim(p, f"2010{(i % 12) + 1:02d}15", tjr_drg,
                      dx_pool=TJR_DX, pcs_pool=TJR_PCS)
else:
    for i, p in enumerate(patients):
        years = [2008, 2009, 2010]
        if i in (15, 16, 17):
            years = [[2008, 2009], [2008, 2010], [2009, 2010]][i - 15]
        if i in (18, 19):
            years = [2007, 2011]
        for y in years:
            n = 1 + (i + y) % 3
            for k in range(n):
                date = f"{y}{(k % 12) + 1:02d}{((i + k) % 28) + 1:02d}"
                # float-string date variant (pandas mixed-dtype artifact)
                if (i + k) % 7 == 0:
                    date += ".0"
                drg = "001" if (i + k) % 2 == 0 else "123"
                add_claim(p, date, drg)
    # TJR claims
    add_claim("P0000", "20080615", "470")          # early TJR — dropped
    add_claim("P0001", "20101001", "470")          # label=1
    add_claim("P0002", "20101102", "469")          # label=1
    add_claim("P0003", "20101203", "470")          # label=1
    # garbage dates → coerce+dropna path
    add_claim("P0004", "", "001")
    add_claim("P0005", "garbage", "001")
    add_claim("P0006", "2010-01-01", "001")

with open(f"{OUT}/ip.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["DESYNPUF_ID", "CLM_ID", "CLM_FROM_DT", "CLM_DRG_CD"] +
               [f"ICD9_DGNS_CD_{i}" for i in range(1, 11)] +
               [f"ICD9_PRCDR_CD_{i}" for i in range(1, 7)])
    w.writerows(rows)

# ---- prescription events (loaded-but-unused parity) ----------------------
with open(f"{OUT}/pde.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["DESYNPUF_ID", "PROD_SRVC_ID"])
    for i in range(50):
        w.writerow([patients[i % N_PAT], f"D{i:05d}"])

print(f"wrote fixtures to {OUT}: "
      f"{len(rows)} claims, {N_PAT} patients, "
      f"{len(DX)} dx rows, {len(PCS)} pcs rows")
