"""Host-side file IO — format parity with reference `data/loader.py`.

Interaction files: one header line (skipped), then `user<TAB>item[...]`
or comma-separated; weight is forced to 1.0 (data/loader.py:24-38).
KG files: one header line, then `h<TAB>r<TAB>t` (data/loader.py:66-78).

A vectorised numpy/pandas reader replaces the reference's per-line
Python loop; a native C++ fast path (native/) plugs in when built.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def load_data_set(path: str) -> np.ndarray:
    """Load interactions -> int64 array [n, 2] of (user, item) raw ids.

    Uses the native mmap parser (native/fastload.cpp) when the shared
    library builds; falls back to pandas.
    """
    from ..native import load_interactions

    native = load_interactions(path)
    if native is not None:
        return native
    with open(path) as f:
        first = f.readline()
        sep = "\t" if "\t" in first else ","
    df = pd.read_csv(
        path, sep=sep, header=None, skiprows=1, usecols=[0, 1], names=["u", "i"], engine="c"
    )
    return df.to_numpy(np.int64)


def load_kg_data(path: str) -> pd.DataFrame:
    """Load KG triples -> DataFrame with columns h, r, t (ints)."""
    df = pd.read_csv(path, sep="\t", header=None, skiprows=1, names=["h", "r", "t"], engine="c")
    return df.astype(np.int64)


def write_interactions(path: str, data: np.ndarray, header: str = "user\titem") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(header + "\n")
        for u, i in data[:, :2]:
            f.write(f"{int(u)}\t{int(i)}\n")


def write_kg(path: str, triples: np.ndarray, header: str = "h\tr\tt") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(header + "\n")
        for h, r, t in triples:
            f.write(f"{int(h)}\t{int(r)}\t{int(t)}\n")
