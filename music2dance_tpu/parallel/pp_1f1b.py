"""Lockstep 1F1B pipeline schedule: O(S) activation memory at depth.

GPipe (parallel/pp.py) runs ALL microbatch forwards, then lets
``jax.grad`` replay the schedule in reverse. Correct and simple — but
reverse-mode autodiff saves residuals for every tick of the forward
scan, so a stage holds activations for all ``M`` in-flight microbatches
at once: peak activation memory grows LINEARLY with the microbatch
count, which is exactly the axis you want to crank to shrink the
pipeline bubble. 1F1B (PipeDream-flush / Megatron-LM's schedule) fixes
that by starting each microbatch's backward as soon as its forward
clears the last stage, bounding the live set to O(S) microbatches.

The classic 1F1B timetable is asynchronous: a backward step costs ~2x a
forward, and GPU implementations let stages drift so F and B slots
interleave without padding. Under SPMD every stage executes the same
program at every tick, so a literal transcription would make every tick
pay max(F, B) — worse than GPipe. This module uses the LOCKSTEP 1F1B
variant instead: each scan iteration does exactly one forward chunk AND
one backward chunk on every stage, with the two waves offset so the
backward of microbatch ``m`` at stage ``s`` runs ``2(S-1-s)``
iterations after its forward:

    forward  of m at stage s: iteration  u = m + s
    backward of m at stage s: iteration  v = m + 2(S-1) - s

At the last stage v == u: the per-microbatch loss cotangent is computed
in the same iteration its forward completes — the 1F1B "turn-around".
Cotangents then ride the reverse ``ppermute`` chain down one stage per
iteration, meeting each stage exactly when scheduled.

Why this is the right trade on TPU:

* **Memory**: a residual written at ``u`` is consumed at ``v``, so at
  most ``2S-1`` chunk INPUTS are live per stage (a rotating
  ``[2S-1, mb, T, H]`` buffer), independent of ``M`` — vs GPipe's
  ``M + S - 1`` ticks' worth of every block-internal activation. The
  chunk backward recomputes its forward from the saved input
  (per-chunk rematerialization — the standard pairing, since storing
  block internals is what blows memory in the first place).
* **Bubble**: ``M + 2S - 2`` iterations of (1F + 1B) vs GPipe's
  ``M + S - 1`` forward ticks + the mirrored backward replay — i.e. a
  bubble fraction of ``(2S-2)/(M+2S-2)`` vs GPipe's
  ``(S-1)/(M+S-1)``. Up to 2x GPipe's bubble, vanishing as M grows —
  and growing M is exactly what the O(S) memory bound now permits.
* **SPMD symmetry**: every stage runs one F-chunk and one B-chunk per
  iteration — no masked-out duplicate compute beyond the pre/head
  replication GPipe already pays (documented at pp.py
  ``make_pp_generator_apply``).

The generator phase of the WGAN-GP step is where this matters (it
differentiates the block stack); the critic phase only ever runs the
generator FORWARD, so ``pp_train_step_1f1b`` reuses GPipe's forward
schedule there. The hand-rolled gradient is exact: each chunk's vjp is
the same ``jax.vjp`` XLA's autodiff would emit, the recomputed forward
is bit-identical to the original, and every loss term is a per-example
mean so the microbatch-mean decomposition is the big-batch loss at f32
reduction order (tests/test_pp_1f1b.py pins 1F1B == GPipe == single
device).

MoE generators are gated out (the Switch aux would need its own
cotangent threading through the interleave); GPipe supports them —
``parallel/pp.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import GANConfig, build_discriminator
from ..train.config import TrainConfig
from ..train.losses import feature_matching, generator_loss
from .mesh import DATA_AXIS
from .pp import (
    STAGE_AXIS,
    _post,
    _pre,
    check_pp_family,
    make_pp_generator_apply,
    pp_import_state,
    pp_shardings,
)

__all__ = ["make_pp_1f1b_g_vag", "pp_train_step_1f1b"]

_PRE_KEYS = ("encoder", "in_proj")
_POST_KEYS = ("ln_f", "head_fc", "head_out")


def make_pp_1f1b_g_vag(gan: GANConfig, tc: TrainConfig, mesh: Mesh,
                       n_micro: int):
    """Build the generator-phase ``g_vag`` hook for train/step.py:
    ``(g_params, d_params, batch, z) -> ((loss, aux), grads)`` with the
    block stack scheduled lockstep-1F1B over the mesh's stage axis.

    ``g_params`` is the STACKED layout (pp_stack_params); grads come
    back in the same layout, so optax/EMA in the step are unchanged."""
    from ..models.transformer import TransformerBlock

    cfg = gan.generator
    check_pp_family(gan, mesh.shape[STAGE_AXIS])
    if cfg.moe_experts > 1:
        raise ValueError(
            "1F1B does not thread the MoE Switch aux through its "
            "interleaved schedule — use the GPipe pp_train_step for "
            "MoE generators (parallel/pp.py)"
        )
    if cfg.film_cond:
        raise ValueError(
            "film_cond is not supported under pipeline parallelism: the "
            "stage schedule threads only the hidden activation between "
            "stages, not the per-block FiLM conditioning tensor"
        )
    disc = build_discriminator(gan.discriminator)
    cond = gan.discriminator.conditional
    S = mesh.shape[STAGE_AXIS]
    M = n_micro
    R = 2 * S - 1  # rotating residual slots: max in-flight chunk inputs
    U = M + 2 * S - 2  # scan iterations (see module docstring timetable)
    block = TransformerBlock(
        cfg.hidden_dim, cfg.tr_heads, cfg.tr_mlp_ratio, cfg.dtype,
        causal=True, attn_impl=cfg.attn_impl,
    )

    def chunk_fwd(blocks_local, x):
        def one(h, bp):
            return block.apply({"params": bp}, h), None

        h, _ = jax.lax.scan(one, x, blocks_local)
        return h

    aux_keys = []
    if tc.feature_matching_weight:
        aux_keys.append("fm")
    if tc.beat_loss_weight:
        aux_keys.append("beat_loss")

    def body(blocks_local, pre_tree, post_tree, d_params, feats, z, poses):
        b_local, t, _ = feats.shape
        if b_local % M:
            raise ValueError(
                f"n_micro={M} does not divide the per-data-shard batch "
                f"{b_local}"
            )
        mb = b_local // M
        f_m = feats.reshape(M, mb, t, feats.shape[-1])
        z_m = z.reshape(M, mb, z.shape[-1])
        p_m = poses.reshape(M, mb, t, poses.shape[-1])
        stage = jax.lax.axis_index(STAGE_AXIS)
        last = S - 1

        def pre_fn(pt, fe, zz):
            return _pre(cfg, pt, fe, zz)

        def head_loss(pt, y, fe, po):
            poses_g = _post(cfg, pt, y)
            s_fake = disc.apply(d_params, poses_g, fe if cond else None)
            loss = generator_loss(s_fake, poses_g, tc.continuity_weight)
            aux = {}
            if tc.feature_matching_weight:
                fcond = fe if cond else None
                _, ff = disc.apply(d_params, poses_g, fcond,
                                   return_features=True)
                _, fr = disc.apply(d_params, po, fcond,
                                   return_features=True)
                fm = feature_matching(jax.lax.stop_gradient(fr), ff)
                loss = loss + tc.feature_matching_weight * fm
                aux["fm"] = fm
            if tc.beat_loss_weight:
                from ..train.conditioning import beat_alignment_loss

                bl = beat_alignment_loss(poses_g, fe)
                loss = loss + tc.beat_loss_weight * bl
                aux["beat_loss"] = bl
            return loss, aux

        def mslice(arr, m):
            return jax.lax.dynamic_index_in_dim(arr, m, 0, keepdims=False)

        x_sds = jax.eval_shape(
            pre_fn, pre_tree, jax.eval_shape(lambda a: a[0], f_m),
            jax.eval_shape(lambda a: a[0], z_m),
        )

        def tree_add_where(acc, new, flag):
            return jax.tree.map(
                lambda a, n: a + jnp.where(flag, n, jnp.zeros_like(n)),
                acc, new,
            )

        def it(carry, u):
            (fwd_buf, bwd_buf, resid, dblocks, dpre, dpost, loss_acc,
             aux_acc) = carry

            # ---- forward half: stage s forwards microbatch u - s ----
            mf = u - stage
            f_act = (mf >= 0) & (mf < M)
            mf_c = jnp.clip(mf, 0, M - 1)
            fe_f, z_f = mslice(f_m, mf_c), mslice(z_m, mf_c)
            x0 = pre_fn(pre_tree, fe_f, z_f)  # real input only at stage 0
            x_in = jnp.where(stage == 0, x0, fwd_buf)
            slot_f = mf_c % R
            old = jax.lax.dynamic_index_in_dim(resid, slot_f, 0,
                                               keepdims=False)
            resid = jax.lax.dynamic_update_index_in_dim(
                resid, jnp.where(f_act, x_in, old), slot_f, 0
            )
            y = chunk_fwd(blocks_local, x_in)

            # loss turn-around: at the LAST stage, microbatch mf's
            # forward and backward share this iteration — compute the
            # per-microbatch loss and its cotangent here
            po_l = mslice(p_m, mf_c)
            l_val, head_vjp, aux_t = jax.vjp(
                lambda pt, yy: head_loss(pt, yy, fe_f, po_l),
                post_tree, y, has_aux=True,
            )
            dpost_t, dy_l = head_vjp(jnp.ones_like(l_val))
            sel_head = f_act & (stage == last)
            dpost = tree_add_where(dpost, dpost_t, sel_head)
            loss_acc = loss_acc + jnp.where(sel_head, l_val, 0.0)
            aux_acc = {
                k: aux_acc[k] + jnp.where(sel_head, aux_t[k], 0.0)
                for k in aux_acc
            }
            nfwd = jax.lax.ppermute(
                y, STAGE_AXIS, [(s, s + 1) for s in range(S - 1)]
            )

            # ---- backward half: stage s backwards u - (2S-2-s) ----
            mb_i = u - (2 * S - 2 - stage)
            b_act = (mb_i >= 0) & (mb_i < M)
            mb_c = jnp.clip(mb_i, 0, M - 1)
            x_saved = jax.lax.dynamic_index_in_dim(
                resid, mb_c % R, 0, keepdims=False
            )
            dy_in = jnp.where(stage == last, dy_l, bwd_buf)
            _, chunk_vjp = jax.vjp(chunk_fwd, blocks_local, x_saved)
            dbl, dx = chunk_vjp(dy_in)
            dblocks = tree_add_where(dblocks, dbl, b_act)
            fe_b, z_b = mslice(f_m, mb_c), mslice(z_m, mb_c)
            _, pre_vjp = jax.vjp(lambda pt: pre_fn(pt, fe_b, z_b), pre_tree)
            (dpre_t,) = pre_vjp(dx.astype(x_sds.dtype))
            dpre = tree_add_where(dpre, dpre_t, b_act & (stage == 0))
            nbwd = jax.lax.ppermute(
                dx, STAGE_AXIS, [(s, s - 1) for s in range(1, S)]
            )
            return (nfwd, nbwd, resid, dblocks, dpre, dpost, loss_acc,
                    aux_acc), None

        carry0 = (
            jnp.zeros(x_sds.shape, x_sds.dtype),            # fwd_buf
            jnp.zeros(x_sds.shape, x_sds.dtype),            # bwd_buf
            jnp.zeros((R,) + x_sds.shape, x_sds.dtype),     # resid
            jax.tree.map(jnp.zeros_like, blocks_local),     # dblocks
            jax.tree.map(jnp.zeros_like, pre_tree),         # dpre
            jax.tree.map(jnp.zeros_like, post_tree),        # dpost
            jnp.float32(0.0),                               # loss
            {k: jnp.float32(0.0) for k in aux_keys},        # aux
        )
        (_, _, _, dblocks, dpre, dpost, loss_acc, aux_acc), _ = (
            jax.lax.scan(it, carry0, jnp.arange(U, dtype=jnp.int32))
        )
        inv = 1.0 / M

        def stage_then_data(x, *, data_op):
            x = jax.lax.psum(x, STAGE_AXIS)
            return data_op(x, DATA_AXIS)

        loss = stage_then_data(loss_acc * inv, data_op=jax.lax.pmean)
        aux = {k: stage_then_data(v * inv, data_op=jax.lax.pmean)
               for k, v in aux_acc.items()}
        # dblocks live per stage (different blocks) — only the DATA mean;
        # dpre/dpost were masked to one stage — psum over STAGE, DATA mean
        dblocks = jax.tree.map(
            lambda g: jax.lax.pmean(g * inv, DATA_AXIS), dblocks
        )
        dpre = jax.tree.map(
            lambda g: stage_then_data(g * inv, data_op=jax.lax.pmean), dpre
        )
        dpost = jax.tree.map(
            lambda g: stage_then_data(g * inv, data_op=jax.lax.pmean), dpost
        )
        return loss, aux, dblocks, dpre, dpost

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), P(), P(), P(), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P(STAGE_AXIS), P(), P()),
        check_vma=False,
    )

    def g_vag(g_params, d_params, batch, z):
        if set(g_params) != {"params"}:
            raise ValueError(
                f"1F1B g_vag expects a params-only variable dict; got "
                f"collections {sorted(g_params)} — a variant carrying "
                "e.g. batch_stats cannot ride this schedule (the rebuilt "
                "gradient tree would drop the extra collection and fail "
                "opaquely at the optax update)"
            )
        inner = g_params["params"]
        extra = set(inner) - {"blocks", *_PRE_KEYS, *_POST_KEYS}
        if extra:
            raise ValueError(
                f"unexpected generator params outside the 1F1B split: "
                f"{sorted(extra)} — the schedule stages 'blocks' and "
                "closes pre/post over the known keys"
            )
        pre_tree = {k: inner[k] for k in _PRE_KEYS}
        post_tree = {k: inner[k] for k in _POST_KEYS}
        loss, aux, dblocks, dpre, dpost = sharded(
            inner["blocks"], pre_tree, post_tree, d_params,
            batch["feats"], z, batch["poses"],
        )
        grads = {"params": {**dpre, **dpost, "blocks": dblocks}}
        return (loss, {"g_loss": loss, **aux}), grads

    return g_vag


def pp_train_step_1f1b(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state,
    n_micro: int = 2,
    donate: bool = True,
    place: bool = True,
):
    """Jitted DP+PP train step with the generator phase scheduled
    lockstep-1F1B (module docstring). Drop-in sibling of
    ``pp.pp_train_step``: same stacked state layout, same shardings,
    same metrics — only the G-phase gradient computation changes (the
    critic phases reuse GPipe's forward-only schedule, since they never
    differentiate the generator)."""
    from ..train.step import make_train_step

    check_pp_family(gan, mesh.shape[STAGE_AXIS])
    if tc.grad_accum > 1:
        raise ValueError(
            "1F1B already microbatches the generator phase — compose "
            "grad_accum with the GPipe pp_train_step instead"
        )
    if tc.batch_size % (mesh.shape[DATA_AXIS] * n_micro):
        raise ValueError(
            f"batch_size={tc.batch_size} must divide over "
            f"data axis {mesh.shape[DATA_AXIS]} x n_micro {n_micro}"
        )
    gen_apply = make_pp_generator_apply(gan.generator, mesh, n_micro)
    g_vag = make_pp_1f1b_g_vag(gan, tc, mesh, n_micro)
    step = make_train_step(gan, tc, axis_name=None, fused=False,
                           gen_apply=gen_apply, g_vag=g_vag)
    pp_state = pp_import_state(state)
    state_sh = pp_shardings(pp_state, mesh)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    fn = jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )
    if place:
        pp_state = jax.device_put(pp_state, state_sh)
    return fn, pp_state
