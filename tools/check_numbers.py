"""Cross-check published performance numbers against BASELINE.json.

VERDICT round 3 (weak #3, next #5): the same number must not appear
in two places with two values. BASELINE.json is the single source of
truth for measured ms/frame + Mrays/s; this tool verifies that every
bold number in README.md's performance table matches a value in
BASELINE.json (within rounding), and that the test count quoted
anywhere equals `pytest --collect-only -q` (checked separately by
tests/test_docs.py, which runs this module's README check on CPU).

Usage: python tools/check_numbers.py   (exit 1 on drift)
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def baseline_values():
    """Every numeric leaf in BASELINE.json's published section."""
    with open(os.path.join(HERE, "BASELINE.json")) as f:
        pub = json.load(f)["published"]
    vals = set()

    def walk(d):
        for v in d.values():
            if isinstance(v, dict):
                walk(v)
            elif isinstance(v, (int, float)):
                vals.add(float(v))

    walk(pub)
    return vals


def readme_bold_numbers():
    """Bold numbers inside README's performance table rows."""
    with open(os.path.join(HERE, "README.md")) as f:
        text = f.read()
    m = re.search(r"## Performance.*?(?=\n## |\Z)", text, re.S)
    if not m:
        return []
    out = []
    for line in m.group(0).splitlines():
        if not line.startswith("|"):
            continue
        for num in re.findall(r"\*\*([0-9][0-9.,]*)\*\*", line):
            out.append((float(num.replace(",", "")), line.strip()[:60]))
    return out


def default_flag_fingerprint():
    """The sorted-path default-flag fingerprint, from the live modules.

    VERDICT round 4 (weak #2): README/BASELINE went stale because the
    consistency check could not see that a DEFAULT changed without a
    re-measurement. BASELINE.json's config4 records the fingerprint its
    numbers were measured under; this recomputes the current one so
    test_docs fails when a flag default changes and the numbers don't.
    Returns None when PT_TPU_* env overrides are set (the fingerprint
    is only meaningful for out-of-the-box defaults)."""
    if any(k.startswith("PT_TPU_") for k in os.environ):
        return None
    sys.path.insert(0, HERE)
    from project3_cuda_path_tracer_tpu.ops import megakernel, pipeline

    parts = [
        f"SORT_SUPER_MIN_TRIS={pipeline.SORT_SUPER_MIN_TRIS}",
        f"SORT_EXPAND={pipeline.SORT_EXPAND}",
        f"SORT_PACK64={int(pipeline.SORT_PACK64)}",
        f"SORT_COMPACT={int(pipeline.SORT_COMPACT)}",
        f"SORT_RADIX={int(pipeline.SORT_RADIX)}",
        f"SORT_SPILL={int(pipeline.SORT_SPILL)}",
        f"SWEEP_CULL={int(pipeline.SWEEP_CULL)}",
        f"SWEEP_PIPE={int(pipeline.SWEEP_PIPE)}",
        f"SWEEP_DEFER={int(pipeline.SWEEP_DEFER)}",
        f"SWEEP_PACKWIN={int(pipeline.SWEEP_PACKWIN)}",
        f"MESH_CHUNK={megakernel.MESH_CHUNK}",
        f"MESH_SUPER={megakernel.MESH_SUPER}",
    ]
    return " ".join(parts)


def check_fingerprint():
    """Compare BASELINE.json config4's recorded measurement fingerprint
    against the current module defaults. Returns (recorded, current,
    ok) — ok is True when they match or the check is inapplicable."""
    with open(os.path.join(HERE, "BASELINE.json")) as f:
        cfg4 = json.load(f)["published"]["config4_mesh_bvh"]
    recorded = cfg4.get("measured_under_flags")
    current = default_flag_fingerprint()
    if recorded is None or current is None:
        return recorded, current, recorded is not None
    return recorded, current, recorded == current


def check():
    vals = baseline_values()
    drift = []
    for num, ctx in readme_bold_numbers():
        # match within the printed precision (README rounds)
        if not any(
            abs(num - v) <= max(0.05, 0.005 * abs(v)) for v in vals
        ):
            drift.append((num, ctx))
    return drift


if __name__ == "__main__":
    bad = check()
    for num, ctx in bad:
        print(f"DRIFT: README bold {num} not in BASELINE.json ({ctx})")
    rec, cur, ok = check_fingerprint()
    if not ok:
        print(f"FINGERPRINT DRIFT: BASELINE.json config4 measured under\n"
              f"  {rec}\nbut current defaults are\n  {cur}\n"
              f"re-measure (tools/ab_bigmesh.py / tools/tpu_round4c.sh) "
              f"and update BASELINE.json in the same commit")
    bad = bad or not ok
    print(f"{'FAIL' if bad else 'OK'}: "
          f"{len(readme_bold_numbers())} bold README numbers checked, "
          f"config4 fingerprint {'ok' if ok else 'DRIFTED'}")
    sys.exit(1 if bad else 0)
