"""Dispatch (slice) and merge (scatter/average) of IST sub-model params.

The reference hand-codes these per layer position and per model flavor
(train_ist.py:168-211 and 235-286 for GraphConv; ist_distrib.py:100-367
for SAGE; ist_distrib_gat.py:96-205 for GAT).  All of those reduce to
one rule over our (in, out) weight layout — for weight-layer i with
boundary partitions ``B[i]`` (input side) and ``B[i+1]`` (output side),
subnet s:

  dispatch:  w_s = w[rows(B[i][s]), :][:, B[i+1][s]]   (None -> full slice)
             b_s = b[B[i+1][s]]
  merge:     split dims scatter back; leaves with NO split dims are
             averaged over subnets (train_ist.py:256-268's mean; the
             distributed engine's all-reduce of the shared last bias,
             ist_distrib.py:103).

``rows(...)`` depends on the layer kind:
  gcn  — rows = B[i][s]                      (weight (in, out))
  sage — rows = concat(B[i][s], B[i][s]+in)  (weight (2*in, out); the
         concatenated [h || Ah] input doubles the index set — the
         full_idx of create_partition, ist_distrib.py:59-65)
  gat  — per-head weight (H, in, out): rows = B[i][s] on axis 1, cols =
         B[i+1][s] on axis 2; attn (H, 2*out): cols = full_idx of
         B[i+1][s] (ist_distrib_gat.py:96-205); last-layer attn shared.

The torch reference slices its (out, in) Linear weights with the
transposed rule; results are identical modulo the transpose.

Everything here is jit-compatible (gathers / ``.at`` scatters with
static index shapes) and vmaps over the subnet axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Boundaries = Sequence[Optional[jnp.ndarray]]  # each (K, chunk) or None


def _full_idx(idx: jnp.ndarray, half: int) -> jnp.ndarray:
    """SAGE doubled index: [idx, idx + half] (ist_distrib.py:59-65)."""
    return jnp.concatenate([idx, idx + half])


# mode="fill"/0: VIRTUAL_IDX padding entries of non-divisible
# partitions read zero rows/cols (jnp.take's default OOB fill is NaN);
# the matching merge scatters drop them (JAX's default scatter mode)

def _take_rows(w, idx):
    return w if idx is None else jnp.take(w, idx, axis=0, mode="fill",
                                          fill_value=0)


def _take_cols(w, idx):
    return w if idx is None else jnp.take(w, idx, axis=1, mode="fill",
                                          fill_value=0)


def _sub(b: Optional[jnp.ndarray], s) -> Optional[jnp.ndarray]:
    return None if b is None else b[s]


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def dispatch(params: dict, boundaries: Boundaries, s, kind: str = "gcn") -> dict:
    """Slice subnet ``s``'s params out of the full-width ``params``.

    ``s`` may be a traced scalar (for use under vmap/shard_map with
    ``jax.lax.axis_index``).  ``kind`` in {"gcn", "sage", "gat"}.
    """
    layers = params["layers"]
    n = len(layers)
    out_layers = []
    for i, layer in enumerate(layers):
        b_in = _sub(boundaries[i], s)
        b_out = _sub(boundaries[i + 1], s) if i + 1 < len(boundaries) else None
        if kind == "gcn":
            w = _take_cols(_take_rows(layer["w"], b_in), b_out)
            b = (layer["b"] if b_out is None else
                 jnp.take(layer["b"], b_out, mode="fill", fill_value=0))
            out_layers.append({"w": w, "b": b})
        elif kind == "sage":
            half = layer["w"].shape[0] // 2
            rows = None if b_in is None else _full_idx(b_in, half)
            w = _take_cols(_take_rows(layer["w"], rows), b_out)
            b = (layer["b"] if b_out is None else
                 jnp.take(layer["b"], b_out, mode="fill", fill_value=0))
            out_layers.append({"w": w, "b": b})
        elif kind == "gat":
            w = layer["w"]          # (H, in, out)
            attn = layer["attn"]    # (H, 2*out)
            if b_in is not None:
                w = jnp.take(w, b_in, axis=1, mode="fill", fill_value=0)
            if b_out is not None:
                w = jnp.take(w, b_out, axis=2, mode="fill", fill_value=0)
                half = attn.shape[1] // 2
                attn = jnp.take(attn, _full_idx(b_out, half), axis=1,
                                mode="fill", fill_value=0)
            out_layers.append({"w": w, "attn": attn})
        else:
            raise ValueError(kind)
    return {"layers": out_layers}


def dispatch_all(params: dict, boundaries: Boundaries, num_subnet: int,
                 kind: str = "gcn") -> dict:
    """vmap of :func:`dispatch` over all subnets — stacked sub-params
    with a leading (num_subnet,) axis on every leaf.  This is the whole
    'dispatch storm' of the reference (ist_distrib.py:197-367) as one
    batched gather."""
    return jax.vmap(lambda s: dispatch(params, boundaries, s, kind))(
        jnp.arange(num_subnet))


# ---------------------------------------------------------------------------
# Merge
# ---------------------------------------------------------------------------

def _scatter_leaf(full, stacked, rows, cols, num_subnet: int):
    """Scatter each subnet's shard into ``full``; average if unsplit.
    Disjointness of partitions (guaranteed by construction,
    asserted in tests — the invariant ist_distrib.py:135 assumes
    silently) makes scatter order irrelevant."""
    if rows is None and cols is None:
        return jnp.mean(stacked, axis=0)
    out = full
    for s in range(num_subnet):
        shard = stacked[s]
        if rows is not None and cols is not None:
            out = out.at[rows[s][:, None], cols[s][None, :]].set(shard)
        elif rows is not None:
            out = out.at[rows[s], :].set(shard)
        else:
            out = out.at[:, cols[s]].set(shard)
    return out


def _scatter_bias(full, stacked, idx, num_subnet: int):
    if idx is None:
        return jnp.mean(stacked, axis=0)
    out = full
    for s in range(num_subnet):
        out = out.at[idx[s]].set(stacked[s])
    return out


def merge(params: dict, boundaries: Boundaries, stacked_sub: dict,
          num_subnet: int, kind: str = "gcn") -> dict:
    """Merge stacked sub-params (leading subnet axis, as produced by
    :func:`dispatch_all` + training) back into full-width ``params``.

    Semantics = the reference merge (train_ist.py:235-286): split dims
    scatter, fully-unsplit leaves average over subnets.  Shared
    last-layer bias averaging reproduces the all-reduce/K of
    ist_distrib.py:103.
    """
    layers = params["layers"]
    out_layers = []
    for i, layer in enumerate(layers):
        b_in = boundaries[i]
        b_out = boundaries[i + 1] if i + 1 < len(boundaries) else None
        sub = stacked_sub["layers"][i]
        if kind in ("gcn", "sage"):
            if kind == "sage" and b_in is not None:
                half = layer["w"].shape[0] // 2
                rows = jax.vmap(lambda idx: _full_idx(idx, half))(b_in)
            else:
                rows = b_in
            w = _scatter_leaf(layer["w"], sub["w"], rows, b_out, num_subnet)
            b = _scatter_bias(layer["b"], sub["b"], b_out, num_subnet)
            out_layers.append({"w": w, "b": b})
        elif kind == "gat":
            w, attn = layer["w"], layer["attn"]
            if b_in is None and b_out is None:
                w = jnp.mean(sub["w"], axis=0)
            else:
                for s in range(num_subnet):
                    shard = sub["w"][s]
                    if b_in is not None and b_out is not None:
                        w = w.at[:, b_in[s][:, None], b_out[s][None, :]].set(shard)
                    elif b_in is not None:
                        w = w.at[:, b_in[s], :].set(shard)
                    else:
                        w = w.at[:, :, b_out[s]].set(shard)
            if b_out is None:
                attn = jnp.mean(sub["attn"], axis=0)
            else:
                half = attn.shape[1] // 2
                for s in range(num_subnet):
                    attn = attn.at[:, _full_idx(b_out[s], half)].set(sub["attn"][s])
            out_layers.append({"w": w, "attn": attn})
        else:
            raise ValueError(kind)
    return {"layers": out_layers}
