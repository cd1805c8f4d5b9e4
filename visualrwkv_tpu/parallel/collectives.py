"""Collective helpers for manual (shard_map) regions.

``psum_cotangents_f32`` exists for two reasons:

1. **Numerics** — gradient all-reduce in fp32. When the parameters entering a
   shard_map are bf16 (the bf16-param training modes), shard_map's automatic
   boundary transpose psums each replicated parameter's cotangent in the
   *parameter's* dtype: the fp32-accumulated local gradient is rounded to
   bf16 BEFORE the cross-shard sum. Reducing first in fp32 and rounding once
   at the end keeps ~3 extra bits on a D-way sum (standard practice for
   distributed training; the reference gets this for free from DeepSpeed's
   fp32 grad buffers).
2. **Compiler robustness** — XLA:CPU's ``AllReducePromotion`` pass promotes
   bf16 all-reduces to f32 by cloning them; when layout assignment has
   inserted a ``copy`` at the root of the reduction computation (observed
   with non-default ``{0,1}`` gradient layouts from transposed matmuls), the
   clone CHECK-fails:

       F hlo_instruction.cc:1585 Invalid binary instruction opcode copy
       ... xla::(anonymous namespace)::CloneAllReduce()
       ... xla::AllReducePromotion::RunImpl()

   This killed the round-4 multichip dryrun (MULTICHIP_r04.json rc=-6) for
   some (mesh, micro_bsz, T) shapes. Doing the reduction in f32 ourselves
   means the graph simply never contains a bf16 all-reduce.

Mechanically: jax inserts the automatic dtype-of-the-param psum at every
``pvary`` site — the point where an invariant (replicated) param first meets
varying data, i.e. at each use inside each block — because the transpose of
``pvary`` is ``psum_invariant``. So the wrapper ``pvary``s every float leaf
on the FORWARD pass (free — a type-system cast, no communication): the params
are then varying from the start, no automatic psum is ever inserted, and the
cotangents flow back to the wrapper still unreduced (one per shard), where
the single fp32 psum happens. Unused leaves arrive as ``SymbolicZero`` and
cost nothing. After the wrapper every cotangent is invariant over the manual
axes, matching the replicated primal inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.custom_derivatives import SymbolicZero


def _leaf_vma(x):
    return getattr(jax.typeof(x), "vma", frozenset())


def _pvary(x, axes):
    missing = tuple(sorted(set(axes) - _leaf_vma(x)))
    return jax.lax.pcast(x, missing, to="varying") if missing else x


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def psum_cotangents_f32(axes, tree):
    """Returns ``tree`` with every leaf marked varying over ``axes``;
    cotangents are psummed ONCE, in fp32, over ``axes``.

    Call INSIDE a shard_map, on a pytree of replicated (``P()``) inputs whose
    gradients must be reduced over the manual ``axes``. Custom VJPs consuming
    the wrapped leaves must NOT reduce their cotangents themselves — return
    the shard-local partial gradient (varying) and let this wrapper do the
    one reduction.
    """
    return jax.tree.map(lambda x: _pvary(x, axes), tree)


def _psum_cot_fwd(axes, tree):
    is_primal = lambda x: hasattr(x, "perturbed")
    val = jax.tree.map(
        lambda p: _pvary(p.value, axes), tree, is_leaf=is_primal
    )
    return val, None


def _psum_cot_bwd(axes, _, g):
    def red(x):
        if isinstance(x, SymbolicZero):
            # the zero's aval carries the (varying) OUTPUT vma; None lets jax
            # synthesize a zero matching the invariant input instead
            return None
        over = tuple(a for a in axes if a in _leaf_vma(x))
        if not over:
            return x
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jnp.float32:
            return jax.lax.psum(x.astype(jnp.float32), over).astype(x.dtype)
        return jax.lax.psum(x, over)

    is_cot = lambda x: isinstance(x, SymbolicZero) or hasattr(x, "dtype")
    return (jax.tree.map(red, g, is_leaf=is_cot),)


psum_cotangents_f32.defvjp(_psum_cot_fwd, _psum_cot_bwd, symbolic_zeros=True)
