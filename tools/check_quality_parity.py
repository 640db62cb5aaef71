"""Assert evaluate.py metrics against the reference's PUBLISHED numbers.

The reference's results table (reference readme.md:148-156; ImageNet-1K
validation, 256x256, codebook 1024) is the quality half of the north-star:

    run      usage%   perplexity   L2(mse)   SSIM   PSNR    rFID
    gumbel   99.61    892.00       0.0075    0.61   21.23   6.30
    entropy  99.70    896.78       0.0082    0.62   20.82   6.17

This checker consumes the ``k: v`` metric lines evaluate.py prints and
asserts each against the published value within stated tolerances. It is the
final, pass/fail stage of tools/quality_parity.sh (the one-command
connected-machine runbook); it has no other dependencies so the offline
dry-run test can drive it with canned text.

Tolerances (generous enough for framework-level differences — resize kernels,
bf16 vs fp16 eval paths, FID implementation sensitivity (SURVEY §7 hard
parts) — but far tighter than the gap to the next-best published model):
  rfid           ±8% relative   (6.30 vs original VQGAN's 7.94 is ~21% away)
  used_codebook  ±0.5 absolute percentage points
  perplexity     ±3% relative
  mse            ±8% relative
  ssim           ±0.02 absolute
  psnr           ±0.3 dB absolute

Usage:
  python evaluate.py ... | tee metrics.txt
  python tools/check_quality_parity.py --run gumbel --metrics metrics.txt
"""

from __future__ import annotations

import argparse
import re
import sys

PUBLISHED = {
    # reference readme.md:152-153
    "gumbel": {"used_codebook": 99.61, "perplexity": 892.00, "mse": 0.0075,
               "ssim": 0.61, "psnr": 21.23, "rfid": 6.30},
    "entropy": {"used_codebook": 99.70, "perplexity": 896.78, "mse": 0.0082,
                "ssim": 0.62, "psnr": 20.82, "rfid": 6.17},
}

# (kind, tol): kind 'rel' = |got-want|/want <= tol, 'abs' = |got-want| <= tol
TOLERANCES = {
    "rfid": ("rel", 0.08),
    "used_codebook": ("abs", 0.5),
    "perplexity": ("rel", 0.03),
    "mse": ("rel", 0.08),
    "ssim": ("abs", 0.02),
    "psnr": ("abs", 0.3),
}


def parse_metrics(text: str) -> dict:
    """Extract the ``key: float`` lines evaluate.py prints (evaluate.py:103)."""
    out = {}
    for line in text.splitlines():
        m = re.match(r"^\s*(mse|psnr|ssim|used_codebook|perplexity|rfid)\s*:"
                     r"\s*([-+0-9.eE]+)\s*$", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def check(run: str, metrics: dict, require_rfid: bool = True) -> list:
    """Return a list of failure strings (empty = parity holds)."""
    failures = []
    for key, want in PUBLISHED[run].items():
        if key not in metrics:
            if key == "rfid" and not require_rfid:
                continue
            failures.append(f"{key}: MISSING from evaluate output "
                            f"(published {want})")
            continue
        got = metrics[key]
        kind, tol = TOLERANCES[key]
        err = abs(got - want) / want if kind == "rel" else abs(got - want)
        ok = err <= tol
        mark = "ok" if ok else "FAIL"
        print(f"[{mark}] {key}: got {got:.4f}, published {want:.4f} "
              f"({kind} err {err:.4f}, tol {tol})")
        if not ok:
            failures.append(f"{key}: {got:.4f} vs published {want:.4f} "
                            f"({kind} err {err:.4f} > tol {tol})")
    return failures


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", choices=sorted(PUBLISHED), required=True)
    p.add_argument("--metrics", type=str, required=True,
                   help="file holding evaluate.py stdout ('-' = stdin)")
    p.add_argument("--allow_missing_rfid", action="store_true",
                   help="for smoke/dry runs without converted inception "
                        "weights only — a real parity run must include rFID")
    args = p.parse_args()
    text = (sys.stdin.read() if args.metrics == "-"
            else open(args.metrics).read())
    metrics = parse_metrics(text)
    if not metrics:
        sys.exit(f"no metric lines found in {args.metrics}")
    failures = check(args.run, metrics,
                     require_rfid=not args.allow_missing_rfid)
    if failures:
        print(f"\nQUALITY PARITY FAILED ({args.run}):", file=sys.stderr)
        for f in failures:
            print(f"  - {f}", file=sys.stderr)
        sys.exit(1)
    print(f"\nQUALITY PARITY OK ({args.run}) vs reference readme.md:148-156")


if __name__ == "__main__":
    main()
