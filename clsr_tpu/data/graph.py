"""User-item / item-item graph construction for the LGN model.

Host-side reimplementation of the reference's adjacency builders
(lgn.py:163-506): from the train TSV, take each user's LAST expanding-
history line (= their full history), add user-item edges for every history
item, item-item edges between consecutive history items and to the target
item (lgn.py:172-228).  The joint graph stacks [ [0, R_ui], [R_ui^T, R_ii] ]
(the "short" variant, lgn.py:create_adj_mat_short) and is row-normalized
as D^-1 (A + I) (lgn.py normalized_adj_single over adj + eye).

Also builds the item->category map from the train file (lgn.py:231-287).

Returned as COO edge arrays (src, dst, weight) — the TPU-native graph conv
is a segment-sum over edges (models/lgn.py), replacing TF's fold-split
sparse_tensor_dense_matmul (lgn.py:107-132).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from clsr_tpu.data.vocab import Vocab


@dataclasses.dataclass(eq=False)
class InteractionGraph:
    """COO normalized adjacency over (users + items) nodes + item2cate.

    eq=False: instances hash by identity so flax/jit treat the (static)
    graph object as a constant without comparing arrays."""

    n_users: int
    n_items: int
    src: np.ndarray        # [E] int32 node ids (users: 0..U-1, items: U..U+I-1)
    dst: np.ndarray        # [E] int32
    weight: np.ndarray     # [E] float32 (row-normalized)
    item2cate: np.ndarray  # [I] int32


def build_graph_from_sequences(seqs, n_users: int, n_items: int
                               ) -> InteractionGraph:
    """Core builder over (uid, item_ids, cate_ids) full-history
    sequences — the last element of each sequence is the target, the
    rest the history (lgn.py:172-228 edge semantics).  Shared by the
    TSV path (build_interaction_graph) and the packed-dataset path
    (data/packed.py:build_interaction_graph_packed)."""
    ui_edges = set()
    ii_edges = set()
    item2cate = np.zeros(n_items, dtype=np.int32)

    for uid, item_ids, cate_ids in seqs:
        ids = list(item_ids[:-1])
        t_i = int(item_ids[-1])
        item2cate[t_i] = int(cate_ids[-1])
        for i, c in zip(ids, cate_ids):
            item2cate[i] = int(c)
        for i in ids:
            ui_edges.add((uid, i))
        for i, j in zip(ids[:-1], ids[1:]):
            ii_edges.add((i, j))
            ii_edges.add((j, i))
        if ids:
            ii_edges.add((ids[-1], t_i))
            ii_edges.add((t_i, ids[-1]))

    # joint graph over U+I nodes
    rows, cols = [], []
    for u, i in ui_edges:
        rows.append(u)
        cols.append(n_users + i)
        rows.append(n_users + i)
        cols.append(u)
    for i, j in ii_edges:
        rows.append(n_users + i)
        cols.append(n_users + j)
    n = n_users + n_items
    # + identity (normalized_adj_single(adj + eye))
    rows.extend(range(n))
    cols.extend(range(n))

    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    degree = np.bincount(rows, minlength=n).astype(np.float32)
    d_inv = np.where(degree > 0, 1.0 / np.maximum(degree, 1), 0.0)
    weight = d_inv[rows]

    return InteractionGraph(n_users=n_users, n_items=n_items,
                            src=rows, dst=cols,
                            weight=weight.astype(np.float32),
                            item2cate=item2cate)


def build_interaction_graph(train_file: str, user_vocab: Vocab,
                            item_vocab: Vocab, cate_vocab: Vocab
                            ) -> InteractionGraph:
    # keep each user's LAST line (their longest expanding history)
    last_per_user: Dict[int, Tuple] = {}
    with open(train_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cols = line.split("\t")
            uid = user_vocab.lookup(cols[1])
            last_per_user[uid] = (cols[2], cols[3],
                                  cols[5].split(","), cols[6].split(","))

    def seqs():
        for uid, (ti, tc, hi, hc) in last_per_user.items():
            item_ids = item_vocab.lookup_many(hi) + [item_vocab.lookup(ti)]
            cate_ids = cate_vocab.lookup_many(hc) + [cate_vocab.lookup(tc)]
            yield uid, item_ids, cate_ids

    return build_graph_from_sequences(seqs(), len(user_vocab),
                                      len(item_vocab))
