"""Aggregate per-run results CSVs into one output.csv (the reference's
generate_output.ipynb, scripted).

Usage: python scripts/aggregate_results.py [results_dir] [output.csv]
"""

import sys

sys.path.insert(0, ".")

from hypergraph_diffusion_for_recommendation_tpu.utils.results import (
    aggregate_results,
    write_output_csv,
)


def main(root="./results", out="output.csv"):
    rows = aggregate_results(root)
    write_output_csv(rows, out)
    print(f"{len(rows)} runs -> {out}")
    for r in rows:
        rec = r.get("recall@20", r.get("recall@40", ""))
        print(f"  {r['model']:14s} {r['dataset']:10s} {r['experiment']:14s} recall {rec}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
