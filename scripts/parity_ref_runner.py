"""Run the REFERENCE (`/root/reference/HD_SELFRec`) on CPU in this env.

The reference targets torch 1.10 + CUDA + numba; this environment has
torch CPU-only and no numba. Three shims make it runnable unmodified
(VERDICT r2 #1 — rebuild-vs-reference parity requires the reference's
own numbers on shared data):

  1. numba shim — `util/algorithm.py:3` is the only numba use; a no-op
     `@jit` keeps `find_k_largest` as plain Python.
  2. CUDA shim — `.cuda()` on tensors/modules returns self;
     `torch.cuda.manual_seed*` become no-ops (models call them while
     seeding, e.g. KHGRec.py:77-88).
  3. Seeding — the reference's CF baselines (LightGCN.py, HCCF.py,
     SGL.py, SHT.py, MF) never seed torch/np/random themselves, so runs
     would be irreproducible; we seed all three from --seed before
     main.py executes (the same flag the rebuild consumes).

Usage (cwd must be the parity sandbox, which symlinks the reference
code and holds the shared dataset):

    python /root/repo/scripts/parity_ref_runner.py --model=LightGCN \
        --dataset=lastfm --max_epoch 60 --seed 1 [reference main.py flags]
"""

from __future__ import annotations

import os
import random
import runpy
import sys
import types
import warnings


def install_numba_shim() -> None:
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(fn):
            return fn

        return deco

    numba.jit = jit
    numba.njit = jit
    sys.modules["numba"] = numba


def install_graphlib_shims() -> None:
    """Pure-torch stand-ins for the reference's native graph deps.

    The HD family imports torch_scatter / torch_sparse / dgl
    (requirements.txt: torch-scatter, torch-sparse==0.6.10, dgl), none of
    which exist in this env. Only three call forms are ever used
    (grep over model/: scatter(src, index, dim=-2, reduce, dim_size);
    spmm(index, value, m, n, X); spspmm) and dgl is import-time only
    (TransformerLayer.py:5 — the class is unused in the main path)."""
    import torch

    ts = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=-2, out=None, dim_size=None, reduce="sum"):
        dim = dim % src.dim()
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = n
        idx = index.view([-1 if d == dim else 1 for d in range(src.dim())]).expand_as(src)
        red = {"sum": "sum", "add": "sum", "mean": "mean",
               "max": "amax", "amax": "amax", "min": "amin"}[reduce]
        out_t = torch.zeros(shape, dtype=src.dtype, device=src.device)
        return out_t.scatter_reduce(dim, idx, src, reduce=red, include_self=False)

    ts.scatter = scatter
    sys.modules["torch_scatter"] = ts

    tsp = types.ModuleType("torch_sparse")

    def spmm(index, value, m, n, matrix):
        A = torch.sparse_coo_tensor(index, value, (m, n))
        return torch.sparse.mm(A, matrix)

    def spspmm(indexA, valueA, indexB, valueB, m, k, n, coalesced=False):
        A = torch.sparse_coo_tensor(indexA, valueA, (m, k))
        B = torch.sparse_coo_tensor(indexB, valueB, (k, n))
        C = torch.sparse.mm(A, B).coalesce()
        return C.indices(), C.values()

    tsp.spmm = spmm
    tsp.spspmm = spspmm
    sys.modules["torch_sparse"] = tsp

    dgl = types.ModuleType("dgl")
    dgl.function = types.ModuleType("dgl.function")
    sys.modules["dgl"] = dgl
    sys.modules["dgl.function"] = dgl.function


def install_cuda_shim() -> None:
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None
    torch.cuda.set_device = lambda *a, **k: None
    # models pick 'cuda:0' via torch.cuda.is_available() fallbacks; on
    # CPU-only torch it is already False — nothing to patch there.
    warnings.filterwarnings("ignore")  # legacy torch.sparse.FloatTensor etc.


def seed_everything(seed: int) -> None:
    import numpy as np
    import torch

    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)


def install_fixed_topk() -> None:
    """Replace the reference's find_k_largest with a CORRECT top-K.

    This fork's util/algorithm.py:143-173 seeds its candidate list with
    item ids 0..K-1 and then re-scans ALL candidates from index 0, so
    any of the first K ids that survives in the final top-K is inserted
    a second time: the returned list contains DUPLICATE ids (~2.4 dup
    slots per top-40 on a 600-item catalog; ~0.04 at 17k items). A
    duplicated hit adds its position discount to DCG twice (inflating
    NDCG) and evicts a real candidate from the window (deflating
    recall/hit/precision). This flag swaps in an exact stable top-K
    (score desc, first-occurrence/lowest-id ties — the same tie order
    numba's scan would produce without the duplication defect, and the
    same as jax.lax.top_k) so the A/B isolates the defect's metric
    contribution. Must run BEFORE base/ imports resolve
    `from util.algorithm import find_k_largest`."""
    import numpy as np

    sys.path.insert(0, os.getcwd())
    import util.algorithm as alg

    def find_k_largest_fixed(K, candidates):
        c = np.asarray(candidates)
        part = np.argpartition(-c, K - 1)[:K]
        order = np.lexsort((part, -c[part]))
        ids = part[order]
        return list(ids.tolist()), list(c[ids].tolist())

    alg.find_k_largest = find_k_largest_fixed


def install_epoch_timer() -> None:
    """Print one parseable line per trained epoch with the reference's
    OWN measured train time (the value it feeds save_performance_row,
    base/main_recommender.py:191-213) — the throughput-measurement hook
    for scripts/measure_ref_throughput.py. The end-of-run
    save_perfomance_training overwrites the per-epoch CSV rows, so
    stdout is the only reliable carrier."""
    sys.path.insert(0, os.getcwd())
    # TWO GraphRecommender base classes exist (SURVEY 1.3): KHGRec-family
    # models subclass base.main_recommender.GraphRecommender
    # (save_performance_row(ep, time_train, time_test, data_ep)) while
    # LightGCN-family subclass base.graph_recommender.GraphRecommender
    # (save_performance_row(ep, data_ep) with data_ep['train_time']).
    from base import graph_recommender as gr
    from base import main_recommender as mr

    orig_main = mr.GraphRecommender.save_performance_row

    def timed_main(self, ep, time_train, time_test, data_ep):
        print(f"EPOCH_TRAIN_TIME {ep} {time_train:.4f} {time_test:.4f}",
              flush=True)
        return orig_main(self, ep, time_train, time_test, data_ep)

    mr.GraphRecommender.save_performance_row = timed_main

    # LightGCN-family never calls save_performance_row; its train_time
    # flows through fast_evaluation(epoch, train_time=...) only
    orig_gr = gr.GraphRecommender.fast_evaluation

    def timed_gr(self, epoch, kwargs=None, train_time=None):
        if train_time is not None:
            print(f"EPOCH_TRAIN_TIME {epoch} {train_time:.4f} 0.0",
                  flush=True)
        return orig_gr(self, epoch, kwargs=kwargs, train_time=train_time)

    gr.GraphRecommender.fast_evaluation = timed_gr


def main() -> None:
    seed = 60
    fix_topk = False
    emit_times = False
    argv = []
    it = iter(enumerate(sys.argv[1:]))
    for i, a in it:
        if a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        elif a == "--seed" and i + 2 < len(sys.argv):
            seed = int(sys.argv[i + 2])
        if a == "--fix_topk":  # runner-only flag, not passed to main.py
            fix_topk = True
            continue
        if a == "--emit_epoch_times":  # runner-only flag
            emit_times = True
            continue
        argv.append(a)

    sys.path.insert(0, os.getcwd())
    install_numba_shim()
    install_graphlib_shims()
    install_cuda_shim()
    if fix_topk:
        install_fixed_topk()
    if emit_times:
        install_epoch_timer()
    seed_everything(seed)
    sys.argv = ["main.py"] + argv
    runpy.run_path("main.py", run_name="__main__")


if __name__ == "__main__":
    main()
