"""Batch retrieval CLI over an exported embedding artifact.

    # export during training
    python -m hypergraph_diffusion_for_recommendation_tpu.cli \
        --model=LightGCN --dataset=... --export_embeddings

    # serve top-k
    python -m hypergraph_diffusion_for_recommendation_tpu.serving_cli \
        --embeddings results/LightGCN/.../embeddings.npz \
        --users 3,17,942 --k 20
    python -m ....serving_cli --embeddings ... --users-file ids.txt \
        --out recs.tsv --include-rated

Output: TSV rows `user <TAB> rank <TAB> item <TAB> score` (raw ids).
`--users all` scores the full exported user vocabulary. The retrieval
itself is `eval.serving.Retriever` — no dataset or model rebuild.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--embeddings", required=True, help="embeddings.npz from a training run")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--users", type=str, default=None,
                   help="comma-separated raw user ids, or 'all'")
    p.add_argument("--users-file", type=str, default=None,
                   help="file with one raw user id per line")
    p.add_argument("--include-rated", action="store_true",
                   help="do not exclude training-history items")
    p.add_argument("--out", type=str, default=None, help="output TSV (default stdout)")
    p.add_argument("--block", type=int, default=1024, help="users per device batch")
    p.add_argument("--mesh_model", type=int, default=1,
                   help=">1 row-shards the catalog over the model axis")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from .eval.serving import Retriever

    mesh = None
    if args.mesh_model > 1:
        from .parallel import make_mesh

        mesh = make_mesh(1, args.mesh_model)
    r = Retriever.load(args.embeddings, mesh=mesh, block=args.block)

    if args.users_file:
        with open(args.users_file) as f:
            users = [int(line.strip()) for line in f if line.strip()]
    elif args.users == "all":
        users = [int(u) for u in r.id2user]
    elif args.users:
        users = [int(u) for u in args.users.split(",")]
    else:
        print("pass --users or --users-file", file=sys.stderr)
        return 2

    ids, scores = r.topk(users, k=args.k, exclude_rated=not args.include_rated)
    out = open(args.out, "w") if args.out else sys.stdout
    try:
        for u, row_ids, row_scores in zip(users, ids, scores):
            for rank, (i, s) in enumerate(zip(row_ids, row_scores), start=1):
                out.write(f"{u}\t{rank}\t{int(i)}\t{float(s):.6f}\n")
    finally:
        if args.out:
            out.close()
    if args.out:
        print(f"wrote {len(users) * args.k} rows to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
