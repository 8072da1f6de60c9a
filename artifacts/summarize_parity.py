"""Render the VMH parity curve (artifacts/vmh_parity.jsonl) as the
PARITY.md table: our every-10-epoch MSE beside the reference's published
curve (reference docs/src/tutorials/VMH.md:153-174)."""
import json
import sys

REF = {10: 0.0272, 20: 0.0269, 30: 0.0254, 40: 0.0232, 50: 0.0106,
       60: 0.0104, 70: 0.0098, 80: 0.0089, 90: 0.0064, 100: 0.0042,
       110: 0.0026, 120: 0.0023, 130: 0.0020, 140: 0.0017, 150: 0.0016,
       160: 0.0013, 170: 0.0012, 180: 0.0011, 190: 0.0010, 200: 0.00098}


def main(path="artifacts/vmh_parity.jsonl"):
    recs = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            recs[r["step"]] = r["train_mse"]
    first = recs.get(1)
    print("| epoch | this repo (synthetic convdiff) | reference "
          "(convdiff_n3000.jld2) |")
    print("|---|---|---|")
    if first is not None:
        print(f"| 1 | {first:.5f} | — |")
    for e in sorted(REF):
        ours = recs.get(e)
        print(f"| {e} | {'—' if ours is None else f'{ours:.5f}'} "
              f"| {REF[e]:.5f} |")
    last = max(recs)
    print(f"\nfinal: epoch {last}, train MSE {recs[last]:.6f} "
          f"(start {first:.5f}, reduction {first / recs[last]:.1f}x; "
          f"reference 200-epoch reduction from its first printed value "
          f"0.0272 -> 0.00098 = 27.8x)")


if __name__ == "__main__":
    main(*sys.argv[1:])
