"""Sequential-recommendation data path.

Parity with reference `data/sequence.py` + `util/sampler.py:292-320`:
  * item ids are 1-based with 0 as the padding placeholder
    (data/sequence.py:27);
  * a user's sequence is their training items in interaction order;
    users with < 2 items are dropped (data/sequence.py:40-44);
  * training windows: seq = items[:-1] (last max_len), positions
    1..len, targets y = items shifted by one, one negative per
    position not in the user's history (util/sampler.py:302-318).

TPU redesign: all windows are padded to [n_seqs, max_len] on device
once; per-epoch batching is a shuffled row-gather; per-position
negatives use the same rejection-free redraw as the CF sampler.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core.types import pad_to_multiple, padded_rows_from_lists
from .dataset import InteractionData


@struct.dataclass
class SeqDeviceData:
    seq: jnp.ndarray  # [n_pad, max_len] 1-based item ids, 0 pad
    pos: jnp.ndarray  # [n_pad, max_len] positions 1.., 0 pad
    y: jnp.ndarray  # [n_pad, max_len] 1-based targets, 0 pad
    seq_len: jnp.ndarray  # [n_pad]
    seq_valid: jnp.ndarray  # [n_pad] bool (false for padding rows / len<2)
    seq_user: jnp.ndarray  # [n_pad] dense user id of each sequence row
    rated_pad_1b: jnp.ndarray  # [n_users, max_deg] 1-based history, -1 pad
    max_len: int = struct.field(pytree_node=False)
    n_items: int = struct.field(pytree_node=False)  # item_num (1-based ids 1..n)
    n_seqs: int = struct.field(pytree_node=False)


def build_seq_device_data(
    inter: InteractionData, max_len: int = 50, pad_multiple: int = 8
) -> SeqDeviceData:
    order = np.argsort(inter.train_u, kind="stable")
    u_sorted = inter.train_u[order]
    i_sorted = inter.train_i[order] + 1  # 1-based
    splits = np.searchsorted(u_sorted, np.arange(1, inter.n_users))
    per_user = np.split(i_sorted, splits)

    rows = []
    for u, items in enumerate(per_user):
        if len(items) < 2:
            continue
        rows.append((u, items))
    n_seqs = len(rows)
    n_pad = max(pad_to_multiple(max(n_seqs, 1), pad_multiple), pad_multiple)

    seq = np.zeros((n_pad, max_len), np.int32)
    pos = np.zeros((n_pad, max_len), np.int32)
    y = np.zeros((n_pad, max_len), np.int32)
    seq_len = np.zeros(n_pad, np.int32)
    seq_user = np.zeros(n_pad, np.int32)
    valid = np.zeros(n_pad, bool)
    for k, (u, items) in enumerate(rows):
        window = items[-(max_len + 1):] if len(items) > max_len else items
        end = min(len(window) - 1, max_len)
        seq[k, :end] = window[:-1][:end]
        pos[k, :end] = np.arange(1, end + 1)
        y[k, :end] = window[1:][:end]
        seq_len[k] = end
        seq_user[k] = u
        valid[k] = True

    rated_1b = padded_rows_from_lists(
        [l + 1 for l in inter.rated_lists()], fill=-1, pad_multiple=pad_multiple
    )

    return SeqDeviceData(
        seq=jnp.asarray(seq),
        pos=jnp.asarray(pos),
        y=jnp.asarray(y),
        seq_len=jnp.asarray(seq_len),
        seq_valid=jnp.asarray(valid),
        seq_user=jnp.asarray(seq_user),
        rated_pad_1b=jnp.asarray(rated_1b),
        max_len=max_len,
        n_items=inter.n_items,
        n_seqs=n_seqs,
    )
