"""Sequence (context) parallelism for the WKV recurrence.

Long-context training wants the TOKEN axis sharded across chips; everything
in an RWKV block is per-token except the WKV recurrence (and the 1-token
shift, handled by the model layer). The recurrence's chunk-level state
transition is LINEAR in the incoming state — for WKV7,
``S_out = S_in @ R + C`` with the k-index transition
``A_t = diag(w_t) + a_t b_t^T`` composed over the shard (the same
diagonal-plus-low-rank structure the chunked kernels exploit intra-chip,
lifted to the inter-chip level; cf. LASP-style linear-attention sequence
parallelism). So each shard can:

1. run its local tokens once with ``S_in = 0``  -> local constant ``C``;
2. run them once with ``S_in = I``              -> ``R + C`` (state rows
   evolve independently, so the identity extracts the transition matrix);
3. relax the boundary states around the ring — ``D-1`` sweeps of one
   ``[N,N] @ [N,N]`` compose + ``ppermute`` propagate the true entry state
   one shard per sweep;
4. re-run the local tokens with the true ``S_in`` for the actual outputs.

Cost: 3 local kernel passes + a cheap ring scan, all shards busy — vs a
naive pipeline's 1/D utilization. The WKV kernel is ~15% of a training
step (PROGRESS.md), so the ~3x WKV overhead costs ~2/D of the step while
the other ~85% scales linearly with 1/D.

Everything here is built from the differentiable public ops (the fused
Pallas kernels keep their custom VJPs), so gradients flow through the ring
with no extra code. Run INSIDE ``jax.shard_map`` with the T axis sharded
over ``axis``; shard boundaries must fall on chunk boundaries.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def vary_to_match(x: Array, ref, extra_axes=()) -> Array:
    """Mark ``x`` varying over ref's manual axes (plus ``extra_axes``):
    shard_map requires scan carries / where-branches built from constants to
    match the varying-manual-axes of data-derived values."""
    want = getattr(jax.typeof(ref), "vma", frozenset()) | set(extra_axes)
    have = getattr(jax.typeof(x), "vma", frozenset())
    missing = tuple(sorted(want - have))
    return jax.lax.pcast(x, missing, to="varying") if missing else x


def _ring_entry_states(call, B, H, N, initial_state, axis: str, ref):
    """Boundary-state relaxation: returns this shard's true entry state.

    ``call(S_in) -> (y, S_out)`` runs the local tokens from ``S_in``;
    ``ref`` is any shard-local input, used to read the full set of manual
    axes the data varies over (constants must match it or scan carries
    mismatch under multi-axis shard_maps).
    """
    f32 = jnp.float32
    D = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    def vary(x):
        return vary_to_match(x, ref, extra_axes=(axis,))

    zero = vary(jnp.zeros((B, H, N, N), f32))
    z0 = zero if initial_state is None else vary(initial_state.astype(f32))
    eye = vary(jnp.broadcast_to(jnp.eye(N, dtype=f32), (B, H, N, N)))

    _, C = call(zero)
    _, RC = call(eye)
    R = RC - C

    is_first = (idx == 0)

    def sweep(_, S_in):
        exit_ = jnp.einsum("bhvk,bhkj->bhvj", S_in, R) + C
        recv = jax.lax.ppermute(
            exit_, axis, [(s, (s + 1) % D) for s in range(D)]
        )
        return jnp.where(is_first, z0, recv)

    S_in = jnp.where(is_first, z0, zero)
    return jax.lax.fori_loop(0, D - 1, sweep, S_in)


def _final_state(S_exit, axis: str):
    """The whole-sequence final state lives on the LAST shard; replicate it
    (masked psum — a multicast ppermute is not universally supported)."""
    D = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    mask = (idx == D - 1).astype(S_exit.dtype)
    return jax.lax.psum(S_exit * mask, axis)


def wkv7_seq_shard(
    r: Array, w_raw: Array, k: Array, v: Array, a: Array, b: Array,
    initial_state: Optional[Array] = None, chunk: int = 16,
    axis: str = "seq",
) -> Tuple[Array, Array]:
    """Shard-local WKV7 under T-axis sharding (run inside shard_map).

    Same contract as ops.wkv7.wkv7 on the FULL sequence: returns this
    shard's y slice and the replicated whole-sequence final state.
    """
    from visualrwkv_tpu.ops.wkv7 import wkv7, wkv_seq_axis

    B, _, H, N = r.shape

    def call(S_in):
        # clear the seq dispatch hook: this IS the per-shard local run
        with wkv_seq_axis(None):
            return wkv7(r, w_raw, k, v, a, b, initial_state=S_in, chunk=chunk)

    S_in = _ring_entry_states(call, B, H, N, initial_state, axis, r)
    y, S_exit = call(S_in)
    return y, _final_state(S_exit, axis)


def wkv6_seq_shard(
    r: Array, w_raw: Array, k: Array, v: Array, u: Array,
    initial_state: Optional[Array] = None, chunk: Optional[int] = None,
    axis: str = "seq",
) -> Tuple[Array, Array]:
    """Shard-local WKV6 under T-axis sharding (diag-decay transition; the
    same identity-probe construction applies). ``chunk`` defaults to
    ``ops.wkv6.DEFAULT_CHUNK`` for consistency with the non-sharded op
    (the diagonal recurrence has no tri-solve instability, so larger
    chunks are safe too — pass one explicitly to trade VMEM for speed)."""
    from visualrwkv_tpu.ops.wkv6 import DEFAULT_CHUNK, wkv6
    from visualrwkv_tpu.ops.wkv7 import wkv_seq_axis

    if chunk is None:
        chunk = DEFAULT_CHUNK
    B, _, H, N = r.shape

    def call(S_in):
        with wkv_seq_axis(None):
            return wkv6(r, w_raw, k, v, u, initial_state=S_in, chunk=chunk)

    S_in = _ring_entry_states(call, B, H, N, initial_state, axis, r)
    y, S_exit = call(S_in)
    return y, _final_state(S_exit, axis)
