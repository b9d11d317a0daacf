"""Second-order flash attention: the WGAN-GP-capable attention core.

Why this exists (round-3 VERDICT missing #4): the stock Pallas flash
kernel (jax.experimental.pallas.ops.tpu.flash_attention) has a
``custom_vjp`` — and custom_vjp functions are ONCE-differentiable by
JAX's own contract. WGAN-GP differentiates the critic's input-gradient
(grad-of-grad), so an attention critic could never ride flash: at 30 s
clips (T≈905) the only alternative was the naive einsum path, which
materializes the [B, heads, T, T] logits tensor for EVERY block and
again for every differentiation level. This module provides a flash
attention whose derivatives work to ARBITRARY order, so the attention
critic trains under WGAN-GP at whole-clip lengths (the ``attn_long_ac``
preset).

Design — recursive ``jax.custom_jvp``, NOT hand-derived second-order
formulas (contrast ops/fused_gp.py, where the recurrent scan left no
choice):

- ``fwd_op(q, k, v)``: primal = the from-scratch Pallas flash FORWARD
  kernel (online-softmax streaming over key blocks; never materializes
  [T, T]). Its jvp rule returns (a recursive primal call, tangent =
  ``jax.jvp`` of the CHUNKED implementation) — differentiation peels one
  level per call, the primal always rides Pallas, and every tangent
  graph is plain transposable XLA. Reverse mode of any order — including
  the GP's reverse-over-reverse — therefore works mechanically, with the
  chunked implementation as the single source of derivative truth: no
  hand-derived Hessian formulas to get wrong.
- ``first_order=True`` selects a ``custom_vjp`` pairing of the Pallas
  forward with the from-scratch Pallas flash BACKWARD kernels (dq pass +
  dkv pass, self-contained: they recompute lse/O internally so no
  residual plumbing crosses the op boundary). Once-differentiable by
  JAX's custom_vjp contract — the generator's seat, where nothing ever
  takes grad-of-grad and both directions should be kernels.

The chunked implementation (``chunked_attention``) is exact attention
with the same online-softmax recurrence as the kernel, expressed as a
remat'd ``lax.scan`` over query blocks — O(T) memory at any
differentiation order, standard ops only. It is also the primal path on
non-TPU backends, so the whole AD structure is testable on CPU.

Cost profile: the arbitrary-order core runs Pallas forward + chunked
XLA derivatives (every order); the first_order core runs Pallas both
directions. On the critic, exactness at order two beats peak speed —
the alternative is the [B, h, T, T] einsum path at EVERY
differentiation level, which is the thing this module deletes.

Reference parity anchor: SURVEY.md §2 C4/C5 (critic + WGAN-GP losses);
the reference repo has no attention family at all — this is the
beyond-reference architecture's enabling op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# full-K/V-in-VMEM envelope for the Pallas kernels: the streamed side of
# every pass holds [Tp, D] f32 per grid row (x2 arrays + tiles). 4 MB
# keeps us far under the ~16 MB/core VMEM with double buffering.
_VMEM_BYTES = 4 * 1024 * 1024


def _block_count(t: int, blk: int) -> int:
    return -(-t // blk)


# ---------------------------------------------------------------------------
# Reference (tests) and chunked exact attention (any-order AD, O(T) memory)
# ---------------------------------------------------------------------------

def naive_attention(q, k, v, causal=False, sm_scale=None):
    """[R, T, D] x3 -> [R, T, D]; materializes [R, T, T] — test oracle."""
    t = q.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    s = jnp.einsum("rtd,rsd->rts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("rts,rsd->rtd", p, v.astype(jnp.float32)).astype(q.dtype)


def chunked_attention(q, k, v, causal=False, sm_scale=None,
                      block_q=128, block_k=128):
    """Exact attention over [R, T, D] without materializing [T, T]:
    online-softmax streaming over key blocks inside a remat'd scan over
    query blocks. Standard XLA ops only — differentiable (and
    transposable) to any order, which is the whole point."""
    r, t, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    nq, nk = _block_count(t, block_q), _block_count(t, block_k)
    tq, tk = nq * block_q, nk * block_k
    qf = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, tq - t), (0, 0)))
    kf = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, tk - t), (0, 0)))
    vf = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, tk - t), (0, 0)))
    # [n, R, blk, D] so scan carries one block per step
    qb = qf.reshape(r, nq, block_q, d).transpose(1, 0, 2, 3) * sm_scale
    kb = kf.reshape(r, nk, block_k, d).transpose(1, 0, 2, 3)
    vb = vf.reshape(r, nk, block_k, d).transpose(1, 0, 2, 3)
    kidx = jnp.arange(nk * block_k).reshape(nk, block_k)

    def q_block(args):
        qi, qblk = args                      # [], [R, bq, D]
        qpos = qi * block_q + jnp.arange(block_q)

        def k_step(carry, xs):
            m, l, acc = carry
            kblk, vblk, kpos = xs
            s = jnp.einsum("rqd,rkd->rqk", qblk, kblk)
            valid = kpos[None, :] < t
            if causal:
                valid = valid & (kpos[None, :] <= qpos[:, None])
            s = jnp.where(valid[None], s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.where(valid[None], jnp.exp(s - m_new[..., None]), 0.0)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum("rqk,rkd->rqd", p, vblk)
            return (m_new, l, acc), None

        m0 = jnp.full((r, block_q), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((r, block_q), jnp.float32)
        a0 = jnp.zeros((r, block_q, d), jnp.float32)
        (m, l, acc), _ = lax.scan(k_step, (m0, l0, a0), (kb, vb, kidx))
        return acc / jnp.maximum(l, 1e-30)[..., None]

    out = lax.map(jax.checkpoint(q_block),
                  (jnp.arange(nq), qb))        # [nq, R, bq, D]
    out = out.transpose(1, 0, 2, 3).reshape(r, tq, d)[:, :t]
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels (from scratch). Layout: [R, T, D], R = batch*heads rows;
# grid rows stream K/V (or Q/dO) whole in VMEM — envelope-checked.
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal,
                t_valid, bq, bk, nk):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale                 # [bq, D]
    qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * bk, bk), :]
        vb = v_ref[0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(
            q, kb.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bq, bk]
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = kpos < t_valid
        if causal:
            valid = valid & (kpos <= qpos)
        s = jnp.where(valid, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p.astype(vb.dtype), vb, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    n_eff = jnp.minimum(nk, ((i + 1) * bq + bk - 1) // bk) if causal else nk
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros_like(o_ref[0], jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_eff, body, (m0, l0, a0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse rides a [R, Tp, 1] layout: a 2-D (1, bq) block would violate
    # the TPU lowering's (8, 128) block-divisibility rule for R > 1;
    # the trailing singleton makes the block (1, bq, 1) — bq tiles the
    # sublane dim, the 1 equals the array's lane dim
    lse_ref[0] = m + jnp.log(l)


def _dq_kernel(q_ref, k_ref, v_ref, c_ref, lse_ref, delta_ref, dq_ref, *,
               scale, causal, t_valid, bq, bk, nk):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale
    c = c_ref[0].astype(jnp.float32)                         # [bq, D]
    lse = lse_ref[0]                                         # [bq, 1]
    delta = delta_ref[0]
    qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(j, dq):
        kb = k_ref[0, pl.ds(j * bk, bk), :]
        vb = v_ref[0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(
            q, kb.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = kpos < t_valid
        if causal:
            valid = valid & (kpos <= qpos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        g = jax.lax.dot_general(
            c, vb.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bq, bk]
        ds = p * (g - delta)
        return dq + jax.lax.dot(
            ds.astype(kb.dtype), kb, preferred_element_type=jnp.float32
        )

    n_eff = jnp.minimum(nk, ((i + 1) * bq + bk - 1) // bk) if causal else nk
    dq = jax.lax.fori_loop(0, n_eff, body, jnp.zeros_like(dq_ref[0],
                                                          jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, c_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, causal, t_valid, bq, bk, nq):
    j = pl.program_id(1)
    kb = k_ref[0].astype(jnp.float32)                        # [bk, D]
    vb = v_ref[0].astype(jnp.float32)
    kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32) * scale
        cb = c_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * bq, bq), :]               # [bq, 1]
        delta = delta_ref[0, pl.ds(i * bq, bq), :]
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bq, bk]
        valid = kpos < t_valid
        if causal:
            qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            valid = valid & (kpos <= qpos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv = dv + jax.lax.dot_general(
            p, cb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bk, D]
        g = jax.lax.dot_general(
            cb, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (g - delta)
        dk = dk + jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    i0 = (j * bk) // bq if causal else 0
    z = jnp.zeros_like(dk_ref[0], jnp.float32)
    dk, dv = jax.lax.fori_loop(i0, nq, body, (z, z))
    # qb enters the ds^T @ qb contraction already scaled, so dk carries
    # its single scale factor — no final multiply (unlike _dq_kernel)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def supports_flash2(t: int, d: int) -> bool:
    """Envelope for the full-K/V-per-row VMEM layout (chunked XLA handles
    everything else, so exceeding this is a silent-correct fallback)."""
    tp = _block_count(t, 128) * 128
    return tp * d * 4 * 2 <= _VMEM_BYTES


def _pad_t(x, tp):
    return jnp.pad(x, ((0, 0), (0, tp - x.shape[1]), (0, 0)))


def _pallas_fwd(q, k, v, causal, scale, interpret, with_lse=False):
    """[R, T, D] x3 -> [R, T, D] (and optionally lse [R, Tp])."""
    r, t, d = q.shape
    bq = bk = min(128, _block_count(t, 8) * 8)
    nq, nk = _block_count(t, bq), _block_count(t, bk)
    tp = max(nq * bq, nk * bk)
    nq, nk = tp // bq, tp // bk
    qp, kp, vp = (_pad_t(x, tp) for x in (q, k, v))
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             t_valid=t, bq=bq, bk=bk, nk=nk)
    row = pl.BlockSpec((1, tp, d), lambda r_, i: (r_, 0, 0),
                       memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        kern,
        grid=(r, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda r_, i: (r_, i, 0),
                         memory_space=pltpu.VMEM),
            row, row,
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda r_, i: (r_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda r_, i: (r_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, tp, d), q.dtype),
            jax.ShapeDtypeStruct((r, tp, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(qp, kp, vp)
    if with_lse:
        return o[:, :t], lse[..., 0]
    return o[:, :t]


def _pallas_bwd(q, k, v, c, causal, scale, interpret):
    """Self-contained flash backward: (q, k, v, cotangent) -> (dq, dk, dv).
    Recomputes lse/O (one extra forward pass) instead of carrying
    residuals — which is what keeps the AD glue residual-free."""
    r, t, d = q.shape
    bq = bk = min(128, _block_count(t, 8) * 8)
    nq = nk = _block_count(t, bq)
    tp = nq * bq
    o, lse = _pallas_fwd(q, k, v, causal, scale, interpret, with_lse=True)
    delta = jnp.pad(
        jnp.sum(c.astype(jnp.float32) * o.astype(jnp.float32), axis=-1),
        ((0, 0), (0, tp - t)),
    )                                                        # [R, Tp]
    qp, kp, vp, cp = (_pad_t(x, tp) for x in (q, k, v, c))
    # lse/delta ride [R, Tp, 1] (see _fwd_kernel's lse note)
    lse3, delta3 = lse[..., None], delta[..., None]
    row = pl.BlockSpec((1, tp, d), lambda r_, i: (r_, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, tp, 1), lambda r_, i: (r_, 0, 0),
                       memory_space=pltpu.VMEM)
    blk = lambda b: pl.BlockSpec((1, b, d), lambda r_, i: (r_, i, 0),
                                 memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          t_valid=t, bq=bq, bk=bk, nk=nk),
        grid=(r, nq),
        in_specs=[blk(bq), row, row, blk(bq),
                  pl.BlockSpec((1, bq, 1), lambda r_, i: (r_, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bq, 1), lambda r_, i: (r_, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(bq),
        out_shape=jax.ShapeDtypeStruct((r, tp, d), q.dtype),
        interpret=interpret,
        compiler_params=params,
    )(qp, kp, vp, cp, lse3, delta3)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          t_valid=t, bq=bq, bk=bk, nq=nq),
        grid=(r, nk),
        in_specs=[blk(bk), blk(bk), row, row, vec, vec],
        out_specs=[blk(bk), blk(bk)],
        out_shape=[jax.ShapeDtypeStruct((r, tp, d), k.dtype),
                   jax.ShapeDtypeStruct((r, tp, d), v.dtype)],
        interpret=interpret,
        compiler_params=params,
    )(kp, vp, qp, cp, lse3, delta3)
    return dq[:, :t], dk[:, :t], dv[:, :t]


# ---------------------------------------------------------------------------
# AD glue (design note in the module docstring). Two cores, built per
# (causal, scale, blocks) since those are static:
#
# - _make_core: recursive custom_jvp. Primal rides the Pallas forward;
#   EVERY derivative order is the jvp of the chunked implementation —
#   plain transposable XLA, so reverse-over-reverse (the WGAN-GP) and
#   anything above it work mechanically. This is the critic's core.
#   (A linear_call pairing that would put the Pallas backward on the
#   first-order reverse path was built and reverted: linear_call's
#   transpose rule asserts every linear operand is an undefined primal,
#   which an OUTER differentiation level violates — exactly the GP's
#   grad-of-grad. The chunked transpose is the robust route.)
# - _make_core_fo: custom_vjp with the Pallas forward AND the Pallas
#   backward kernels — once-differentiable by JAX's custom_vjp contract,
#   for consumers that differentiate exactly once (the generator, whose
#   stock-flash eligibility also requires head_dim % 64 == 0 — these
#   kernels don't care).
# ---------------------------------------------------------------------------

def _on_pallas(q):
    return (jax.default_backend() == "tpu"
            and supports_flash2(q.shape[1], q.shape[2]))


@functools.lru_cache(maxsize=32)
def _make_core(causal: bool, scale: float, block_q: int, block_k: int):
    def chunked(q, k, v):
        return chunked_attention(q, k, v, causal, scale, block_q, block_k)

    @jax.custom_jvp
    def fwd_op(q, k, v):
        if _on_pallas(q):
            return _pallas_fwd(q, k, v, causal, scale, interpret=False)
        return chunked(q, k, v)

    @fwd_op.defjvp
    def fwd_jvp(primals, tangents):
        o = fwd_op(*primals)            # recursive: primal stays Pallas
        # every derivative order: exact chunked XLA — transposable
        # standard ops, which is what makes grad-of-grad work at all
        _, do = jax.jvp(chunked, primals, tangents)
        return o, do

    return fwd_op


@functools.lru_cache(maxsize=32)
def _make_core_fo(causal: bool, scale: float, block_q: int, block_k: int):
    def chunked(q, k, v):
        return chunked_attention(q, k, v, causal, scale, block_q, block_k)

    @jax.custom_vjp
    def fo_op(q, k, v):
        if _on_pallas(q):
            return _pallas_fwd(q, k, v, causal, scale, interpret=False)
        return chunked(q, k, v)

    def fo_fwd(q, k, v):
        return fo_op(q, k, v), (q, k, v)

    def fo_bwd(res, c):
        q, k, v = res
        if _on_pallas(q):
            return _pallas_bwd(q, k, v, c, causal, scale, interpret=False)
        _, pull = jax.vjp(chunked, q, k, v)
        return pull(c)

    fo_op.defvjp(fo_fwd, fo_bwd)
    return fo_op


def flash2_attention(q, k, v, causal=False, sm_scale=None,
                     block_q=128, block_k=128, first_order=False):
    """Second-order-capable flash attention over [B, T, H, D] tensors.

    Default: Pallas flash forward on the primal path, exact chunked XLA
    on every derivative order — including order ≥ 2, which the stock
    flash kernel cannot do at all (the WGAN-GP critic's seat).

    ``first_order=True``: Pallas kernels on BOTH directions via a
    custom_vjp — once-differentiable (JAX's custom_vjp contract), for
    generator-side use where nothing ever takes grad-of-grad.

    Returns [B, T, H, D] in the input dtype.
    """
    b, t, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    make = _make_core_fo if first_order else _make_core
    core = make(bool(causal), float(sm_scale), block_q, block_k)
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    out = core(fold(q), fold(k), fold(v))
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)
