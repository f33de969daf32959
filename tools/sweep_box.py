"""Box-stack tuning sweep on the real chip (BASELINE config 1).

Runs bench.bench_box_stack over (contact_phases, candidate_margin, batch)
combos and prints one JSON line per combo. The ROADMAP levers toward the
10M body-steps/s target: fewer contact phases (2 phases = 2 sequential GS
slices instead of 4), tighter per-island pair tables (smaller
candidate_margin drops far-apart candidate rows at build time), and a
larger island batch to amortize fixed kernel costs.

Usage (real chip): python tools/sweep_box.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="3 headline combos only")
    ap.add_argument("--boxes", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import bench

    combos = [
        # (phases, margin, batch) — current bench default first as control
        (4, 1.0, 8),
        (2, 1.0, 8),
        (2, 0.25, 8),
        (4, 1.0, 32),
        (2, 0.25, 32),
        (1, 0.25, 32),
        (2, 0.25, 64),
    ]
    if args.quick:
        combos = combos[:3]

    best = (0.0, None)
    for phases, margin, batch in combos:
        t0 = time.time()
        try:
            rate, compile_s = bench.bench_box_stack(
                args.boxes, batch, args.steps, args.iters,
                solver_iterations=30, solver_mode="fused_islands",
                contact_phases=phases, candidate_margin=margin)
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            print(json.dumps({"phases": phases, "margin": margin,
                              "batch": batch,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        print(json.dumps({"phases": phases, "margin": margin, "batch": batch,
                          "body_steps_per_s": round(rate),
                          "vs_10M": round(rate / 10e6, 4),
                          "compile_s": round(compile_s, 1),
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
        if rate > best[0]:
            best = (rate, (phases, margin, batch))
    print(json.dumps({"best_body_steps_per_s": round(best[0]),
                      "best_combo": best[1]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
