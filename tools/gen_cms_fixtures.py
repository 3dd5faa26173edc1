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
# Crosswalk CCS-category counts (r10 verdict item 3): the reference's
# real data recodes to 285 dx + 231 pcs categories (516-wide feature
# blocks, cnn_model.ipynb:155 / SURVEY §1.1); the defaults keep the
# committed 30-patient fixture and the ReferenceParity corpus
# byte-identical. Pass --dx-categories 285 --pcs-categories 231 for
# the width-516 CmsScale timing fixture.
ap.add_argument("--dx-categories", type=int, default=5)
ap.add_argument("--pcs-categories", type=int, default=3)
ap.add_argument("--out", default=os.path.join(
    os.path.dirname(__file__), "..", "src", "test", "resources", "cms"))
args = ap.parse_args()
assert args.dx_categories >= 5 and args.pcs_categories >= 3, \
    "widths below the base fixture's 5 dx / 3 pcs are not supported"

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

# Synthetic wide-vocabulary extension: one ICD9-shaped code per extra
# CCS category. Code ranges 60000+/70000+ avoid every hand-written
# code above; category ranges 1000+/2000+ keep the extra categories
# visually distinct from the leakage-bearing 152/153 (prior-TJR) and
# 201-205 (arthritis) categories, whose roles must not dilute.
EXTRA_DX_CODES = [f"6{k:04d}" for k in range(args.dx_categories - 5)]
EXTRA_PCS_CODES = [f"7{k:04d}" for k in range(args.pcs_categories - 3)]
DX += [(f"'{c}'", f"'{1000 + k}'")
       for k, c in enumerate(EXTRA_DX_CODES)]
PCS += [(f"'{c}'", f"'{2000 + k}'")
        for k, c in enumerate(EXTRA_PCS_CODES)]

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
# Wide mode scatters background draws across the full synthetic
# vocabulary so every CCS slot actually lights up (the reference's
# 516-wide blocks are sparse-but-populated); the extra codes never
# carry CCS 152/153, so the leakage mechanism is untouched.
BG_DX = ["4019", "25000", "2724", "99999"] + EXTRA_DX_CODES
BG_PCS = ["0066", "3722", "88888"] + EXTRA_PCS_CODES
TJR_DX = ["71500", "71590", "7160", "71610", "71620", "71536"]
TJR_PCS = ["8151", "8152", "8154"]

if SCALED:
    # Clean fully-enrolled corpus; ~10 background claims/patient/year,
    # ~10% of patients get the 2010 TJR claim → label=1.
    #
    # Cohorts OVERLAP deliberately (r7 verdict №1 — the old exclusive
    # code pools made every task perfectly separable and saturated the
    # parity table at 1.0000):
    #  - every claim draws dx from the SAME arthritis-population pool,
    #    so dx content alone cannot separate TJR claims;
    #  - prior-TJR pcs codes (CCS 152 — the other-knee history) appear
    #    on ~25% of 2008/09 background claims but NEVER on a 2010
    #    background claim, so the patient-year AOV leak ("CCS 152 in
    #    the 2010 block") stays near-exact (train AUC → 1.0, the
    #    BASELINE.md leakage signature) while the per-claim grid task —
    #    which sees day-of-year but not the year — has ~17% of negative
    #    claims wearing the positive pcs signature;
    #  - the TJR claim's DATE is the orderable signal, layered so each
    #    M4 head resolves strictly more of it: positives sit in
    #    November days 16-28; half the prior-TJR negatives sit in
    #    months 1-10 (a DIFFERENT 30.5-day window — windowed pooling
    #    separates them, whole-axis pooling cannot), the other half in
    #    November days 1-13 (the SAME window as the positives — only
    #    the decay recurrence, monotone in absolute day-of-year,
    #    resolves the early/late split) — so the chain's fidelity
    #    ordering (pooling < window < decay) is visible in AUC, not
    #    just argued;
    #  - ~2% of TJR claims are procedure-miscoded (CCS 153 instead of
    #    152) and ~1% of negative patients carry a DRG-miscoded 2010
    #    claim with a real TJR procedure code — label noise that keeps
    #    the Lasso/RF CV and test rows off exactly 1.0000.
    ALL_DX = TJR_DX + BG_DX
    for i, p in enumerate(patients):
        is_pos = i % 10 == 3
        for y in (2008, 2009, 2010):
            for k in range(8 + (i + y) % 5):
                drg = "001" if (i + k) % 2 == 0 else "123"
                dx = random.sample(ALL_DX, 3)
                month, day = random.randint(1, 12), random.randint(1, 28)
                if y < 2010 and random.random() < 0.25:
                    pcs = [random.choice(["8151", "8152"]),
                           random.choice(BG_PCS)]
                    r = random.random()
                    if r < 0.40:
                        # window-resolvable: a far window
                        month, day = (random.randint(1, 10),
                                      random.randint(1, 28))
                    elif r < 0.75:
                        # decay-only: the positives' window, earlier
                        # days
                        month, day = 11, random.randint(1, 13)
                    else:
                        # CLONE: grid-identical to a 2010 TJR claim
                        # (same date window, dx tilt, single-pcs shape)
                        # differing only in the year the grid cannot
                        # see — irreducible per-claim error that keeps
                        # every grid head, m3 included, off saturation
                        month, day = 11, random.randint(16, 28)
                        dx = (random.sample(TJR_DX, 2) +
                              [random.choice(BG_DX)])
                        pcs = [random.choice(["8151", "8152"])]
                elif random.random() < 0.3:
                    pcs = [random.choice(["8154"] + BG_PCS),
                           random.choice(BG_PCS)]
                else:
                    pcs = random.sample(BG_PCS, 2)
                date = f"{y}{month:02d}{day:02d}"
                add_claim(p, date, drg, ndx=3, npcs=len(pcs),
                          dx_pool=dx, pcs_pool=pcs)
        if is_pos:
            tjr_drg = "470" if i % 20 == 3 else "469"
            date = f"201011{random.randint(16, 28):02d}"
            pcs = ["8154"] if random.random() < 0.02 \
                else [random.choice(["8151", "8152"])]
            # dx TILT, not exclusivity: arthritis codes dominate but
            # background codes appear — enough code signal to lift the
            # order-free pooling head off coin-flip, not enough to
            # separate without the date
            dx = random.sample(TJR_DX, 2) + [random.choice(BG_DX)]
            add_claim(p, date, tjr_drg, ndx=3, npcs=1,
                      dx_pool=dx, pcs_pool=pcs)
        elif random.random() < 0.01:
            # DRG-miscoded TJR: real procedure code, background DRG —
            # a 2010 false-flag in the AOV leak feature
            add_claim(p, f"2010{random.randint(1, 12):02d}"
                      f"{random.randint(1, 28):02d}", "123",
                      ndx=3, npcs=1, dx_pool=random.sample(ALL_DX, 3),
                      pcs_pool=[random.choice(["8151", "8152"])])
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
