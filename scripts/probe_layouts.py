"""A/B the pallas segment-SpMM gather layouts at production densities
(VERDICT r2 #3): {base bf16, dedup-gather, int8} on the LastFM-bench
graph AND the ML-1M-shape graph (~163 edges per item column — the
density where the dedup layout should cut the dominant gather stream).

Each cell is a fresh subprocess (the layout is chosen at pack time via
HGDR_DEDUP / HGDR_INT8) running scripts/scale_check.py for a few epochs;
steady-state epoch time = min of the post-compile epochs. Results print
as a markdown table for BENCH_NOTES.

  timeout 3600 python scripts/probe_layouts.py [--epochs 5]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHAPES = {
    # the driver-bench graph (data built by bench.py: 1890 users x ~12k
    # live items, ~84k train edges)
    "lastfm-bench": ["--users", "1890", "--items", "17632", "--degree", "49",
                     "--dim", "128"],
    # ML-1M trained shape (6040 x 3706, ~886k train edges, ~163 edges/col)
    "ml1m": ["--users", "6040", "--items", "3706", "--degree", "147",
             "--dim", "64"],
}
LAYOUTS = {
    "base-bf16": {},
    "dedup": {"HGDR_DEDUP": "1"},
    "int8": {"HGDR_INT8": "1"},
    # dedup+int8: the combined kernel variant — skipped automatically if
    # the packer still makes them mutually exclusive (recorded as n/a)
    "dedup+int8": {"HGDR_DEDUP": "1", "HGDR_INT8": "1"},
}
EPOCH_RE = re.compile(r"epoch (\d+): loss ([\d.]+) \(([\d.]+)s\)")


def run_cell(shape_args, env_extra, epochs, model="KHGRec"):
    env = dict(os.environ)
    env.update(env_extra)
    env.setdefault("HGDR_PALLAS_MAX_NNZ", "4000000")
    cmd = [sys.executable, os.path.join(ROOT, "scripts", "scale_check.py"),
           "--model", model, "--epochs", str(epochs), "--bf16", "--with-kg",
           *shape_args]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                          text=True, timeout=1800, check=False)
    wall = time.time() - t0
    times = [float(t) for _, _, t in EPOCH_RE.findall(proc.stdout)]
    ok = proc.returncode == 0 and "SCALE_CHECK PASS" in proc.stdout
    steady = min(times[1:]) if len(times) > 1 else None
    return dict(ok=ok, steady_s=steady, epochs=times, wall=wall,
                tail="" if ok else (proc.stdout[-400:] + proc.stderr[-400:]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--shapes", default=",".join(SHAPES))
    ap.add_argument("--layouts", default=",".join(LAYOUTS))
    args = ap.parse_args()

    rows = []
    for shape in args.shapes.split(","):
        base = None
        for layout in args.layouts.split(","):
            r = run_cell(SHAPES[shape], LAYOUTS[layout], args.epochs)
            if r["ok"] and layout == "base-bf16":
                base = r["steady_s"]
            rel = (f"{base / r['steady_s']:.2f}x"
                   if r["ok"] and base and r["steady_s"] else "—")
            rows.append((shape, layout,
                         f"{r['steady_s']:.2f}s" if r["steady_s"] else "FAIL",
                         rel))
            print(f"{shape:13s} {layout:11s} steady "
                  f"{r['steady_s'] if r['steady_s'] else float('nan'):.2f}s "
                  f"({'ok' if r['ok'] else 'FAIL'}; wall {r['wall']:.0f}s) "
                  f"{r['tail'][:200]}", flush=True)

    print("\n| graph | layout | steady epoch | vs base |")
    print("|---|---|---|---|")
    for shape, layout, steady, rel in rows:
        print(f"| {shape} | {layout} | {steady} | {rel} |")


if __name__ == "__main__":
    main()
