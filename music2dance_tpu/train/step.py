"""The jit-compiled alternating WGAN-GP train step.

One call = ``n_critic`` critic updates + 1 generator update on the same
batch — "one full alternating train step" [BASELINE]. Both phases live in
ONE jitted function with two independent optax states; there is no
``.detach()`` mutation idiom — the fake batch is ``stop_gradient``-ed for
the critic phase and the critic parameters are simply not differentiated
in the generator phase (SURVEY.md §7 hard part #3).

Data parallelism: the step takes an optional ``axis_name``; when set (by
``music2dance_tpu.parallel.dp.shard_train_step``) gradients and metrics
are ``pmean``-ed across the mesh and the RNG is decorrelated per shard.
The step body is mesh-size-agnostic — the same code runs on 1 device and
on a pod slice.
"""

from __future__ import annotations

from typing import Any, Optional

import chex
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import GANConfig, build_discriminator, build_generator
from ..utils.warn import warn_once  # noqa: F401 — canonical home moved to
#   utils.warn (leaf module) so the model layer can emit routing warnings
#   too; re-exported here because loop/tbptt/tests import it from step.
from .config import TrainConfig
from .losses import critic_loss, feature_matching, generator_loss


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    g_params: Any
    d_params: Any
    opt_g: Any
    opt_d: Any
    rng: jax.Array
    # exponential moving average of g_params (tc.ema_decay > 0) — the
    # standard GAN eval/serving weights; None (an empty pytree node) when
    # disabled, so checkpoints and pytree structure are unchanged then
    ema_g_params: Any = None


def _lr(tc: TrainConfig, base: float):
    if tc.lr_schedule == "constant":
        return base
    if tc.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(
            base, tc.lr_decay_steps, alpha=tc.lr_final_frac
        )
    raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r}")


def make_optimizers(tc: TrainConfig) -> tuple[optax.GradientTransformation, optax.GradientTransformation]:
    def tx(base_lr):
        adam = optax.adam(_lr(tc, base_lr), b1=tc.adam_b1, b2=tc.adam_b2)
        if tc.grad_clip_norm > 0.0:
            return optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), adam)
        return adam

    return tx(tc.lr_g), tx(tc.lr_d)


def init_state(
    key: jax.Array,
    gan: GANConfig,
    tc: TrainConfig,
    sample_batch: dict,
) -> TrainState:
    """Build params + optimizer states from a (possibly tiny) sample batch."""
    gen = build_generator(gan.generator)
    disc = build_discriminator(gan.discriminator)
    feats, poses = sample_batch["feats"], sample_batch["poses"]
    kg, kd, kz, krest = jax.random.split(key, 4)
    z = jax.random.normal(kz, (feats.shape[0], gan.generator.noise_dim))
    g_params = gen.init(kg, feats, z)
    if "losses" in g_params:
        # MoE generators sow their load-balancing aux into a "losses"
        # collection; only the "params" collection is trainable state
        # (the aux is re-sown at apply time via mutable=["losses"])
        g_params = {"params": g_params["params"]}
    d_params = disc.init(kd, poses, feats if gan.discriminator.conditional else None)
    tx_g, tx_d = make_optimizers(tc)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        opt_g=tx_g.init(g_params),
        opt_d=tx_d.init(d_params),
        rng=krest,
        # a fresh COPY, not an alias: the train loops jit with
        # donate_argnums=(0,), and donating g_params and ema_g_params
        # as the same buffers is an XLA error ("attempt to donate the
        # same buffer twice") — hit on the CPU backend by
        # `train.py --ema_decay ... --input_mode stream` (round 5)
        ema_g_params=(jax.tree.map(jnp.copy, g_params)
                      if tc.ema_decay > 0.0 else None),
    )


def make_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    axis_name: Optional[str] = None,
    fused: Optional[bool] = None,
    gen_apply=None,
    gen_apply_aux: bool = False,
    g_vag=None,
):
    """Build ``train_step(state, batch) -> (state, metrics)``.

    ``batch``: {"feats": [B,T,F], "poses": [B,T,P]}. The returned function
    is pure and jittable; callers decide whether to wrap it in ``jax.jit``
    directly (single device) or in ``shard_map`` (DP over a mesh).

    ``fused``: None = use the Pallas kernel paths when a TPU backend is
    active and the configs support them (the default); True = force them
    (interpret mode off-TPU — used by the CPU equivalence tests); False =
    pure XLA.

    ``gen_apply``: optional ``(g_params, feats, z) -> poses`` override of
    the generator forward — used by parallel/pp.py to substitute the
    pipelined block schedule while keeping every other piece of the step
    (alternating phases, GP, EMA, augmentation) byte-identical. Must be
    differentiable wrt g_params.

    ``gen_apply_aux``: the override returns ``(poses, moe_aux)`` instead
    of bare poses — how a pipelined MoE generator hands its Switch
    load-balancing auxiliary back to the loss (parallel/pp.py threads the
    per-microbatch aux through its schedule explicitly because the
    mutable-collection sow cannot cross the shard_map boundary).

    ``g_vag``: optional override of the ENTIRE generator-phase
    value-and-grad: ``(g_params, d_params, batch, z) -> ((loss, aux),
    grads)`` with ``z`` drawn by the step's canonical per-example keys.
    Used by parallel/pp_1f1b.py, whose interleaved forward/backward
    schedule cannot be expressed as a forward for ``jax.grad`` to
    differentiate. The critic phases still use ``gen_apply`` (forward
    only). XLA-path only, and incompatible with grad_accum (the 1F1B
    schedule already microbatches).
    """
    gen = build_generator(gan.generator)
    disc = build_discriminator(gan.discriminator)
    if gen_apply is not None and fused:
        raise ValueError("gen_apply overrides are XLA-path only (fused "
                         "kernels apply the factory generator)")
    if g_vag is not None and fused:
        raise ValueError("g_vag overrides are XLA-path only (the fused "
                         "generator phase has its own two-phase VJP)")
    if g_vag is not None and tc.grad_accum > 1:
        raise ValueError(
            "g_vag with grad_accum would nest two microbatching schemes "
            "— 1F1B already streams microbatches; raise n_micro instead"
        )
    tx_g, tx_d = make_optimizers(tc)
    cond = gan.discriminator.conditional
    if tc.mismatch_weight and not cond:
        raise ValueError(
            "mismatch_weight needs a conditional critic: the matching-"
            "aware term scores (real poses, wrong audio) pairs, which an "
            "unconditional critic cannot even see"
        )
    if tc.mismatch_weight and tc.grad_accum > 1:
        raise ValueError(
            "mismatch_weight under grad_accum would draw negative pairs "
            "within each microbatch SLICE, not the big batch — breaking "
            "grad_accum's exact big-batch-equivalence contract "
            "(tests/test_grad_accum.py). Run mismatch training with "
            "grad_accum=1."
        )
    if tc.joint_gp and not cond:
        raise ValueError(
            "joint_gp bounds the critic's (poses, audio) gradient jointly "
            "— an unconditional critic has no audio input to bound; drop "
            "joint_gp or use a conditional critic"
        )

    def pmean(x):
        if axis_name is None:
            return x
        return jax.lax.pmean(x, axis_name)

    def disc_apply(d_params, poses, feats):
        return disc.apply(d_params, poses, feats if cond else None)

    def per_example_keys(
        key: jax.Array, local_b: int, offset=0, device_b: int | None = None
    ) -> jax.Array:
        """Keys derived from each example's GLOBAL batch index.

        Randomness (noise z, GP interpolation alpha) is attached to the
        example, not the device, so a shard_map-ed step reproduces the
        single-device step exactly (tested in tests/test_dp.py).

        ``offset``/``device_b``: under gradient accumulation a call sees
        a SLICE of the device batch — ``offset`` is the slice start and
        ``device_b`` the full per-device batch (the axis-index stride),
        so a sliced step draws exactly the keys the big batch would
        (tests/test_grad_accum.py).
        """
        start = offset
        if axis_name is not None:
            stride = device_b if device_b is not None else local_b
            start = start + jax.lax.axis_index(axis_name) * stride
        idx = start + jnp.arange(local_b)
        return jax.vmap(jax.random.fold_in, (None, 0))(key, idx)

    # Pallas kernel paths. Generator: ALL of the step's fake batches
    # (n_critic forward-only + 1 differentiable) ride ONE dual fused scan
    # (ops/fused_gdual.py) when supported, falling back to per-phase fused
    # scans. Critic: fused first-order scan for real/fake scores and the
    # hand-derived second-order input-grad op for the gradient penalty —
    # no XLA scan remains anywhere in the step (run_phases.py measured the
    # four XLA critic scan passes at 11.1 of the 14 ms full-preset step).
    from ..ops.fused_critic import (
        fused_critic_apply,
        supports_fused_critic,
        why_not_fused_critic,
    )
    from ..ops.fused_generator import fused_apply, supports_fused, why_not_fused

    if fused is None:
        on_tpu = jax.default_backend() == "tpu"
        gen_interpret = not on_tpu
        fused_gen_ok = on_tpu and supports_fused(gan.generator, interpret=False)
        fused_critic_ok = on_tpu and supports_fused_critic(
            gan.discriminator, interpret=False
        )
        if on_tpu and not fused_gen_ok:
            warn_once(
                f"fused generator kernels disabled — {why_not_fused(gan.generator, False)}"
                "; the step falls back to the slower XLA scan"
            )
        if on_tpu and not fused_critic_ok:
            warn_once(
                "fused critic kernels disabled — "
                f"{why_not_fused_critic(gan.discriminator, False)}"
                "; the step falls back to the slower XLA scan"
            )
    elif fused:
        gen_interpret = True
        fused_gen_ok = supports_fused(gan.generator, interpret=True)
        fused_critic_ok = supports_fused_critic(gan.discriminator, interpret=True)
    else:
        gen_interpret = True
        fused_gen_ok = fused_critic_ok = False

    if tc.joint_gp and fused_critic_ok:
        warn_once(
            "joint_gp routes the critic phase to the XLA path (the fused "
            "GP kernels differentiate wrt poses only); real/fake scoring "
            "still rides the fused critic scan"
        )

    def sample_z(key, b, dtype, offset=0, device_b=None):
        keys = per_example_keys(key, b, offset, device_b)
        return jax.vmap(
            lambda k: jax.random.normal(k, (gan.generator.noise_dim,), dtype)
        )(keys)

    def sample_fake(g_params, feats, key, forward_only=False, offset=0,
                    device_b=None):
        z = sample_z(key, feats.shape[0], feats.dtype, offset, device_b)
        if fused_gen_ok:
            if forward_only:
                return fused_apply(
                    g_params, gan.generator, feats, z, interpret=gen_interpret
                )
            # generator phase: differentiable fused scan (custom two-phase
            # VJP — ops/fused_generator_vjp.py; 1.5x the XLA g_loss grad)
            from ..ops.fused_generator_vjp import fused_apply_diff

            return fused_apply_diff(
                g_params, gan.generator, feats, z, interpret=gen_interpret
            )
        if gen_apply is not None:
            out = gen_apply(g_params, feats, z)
            return out[0] if gen_apply_aux else out
        return gen.apply(g_params, feats, z)

    def critic_scores(d_params, poses, feats):
        if fused_critic_ok:
            return fused_critic_apply(
                d_params, gan.discriminator, poses, feats if cond else None,
                interpret=gen_interpret,
            )
        return disc_apply(d_params, poses, feats)

    def d_loss_fn(d_params, g_params, batch, key, fake=None, offset=0,
                  device_b=None):
        """Critic loss. Fused path: the whole critic-phase core — real and
        fake scores AND the GP's second-order path — as ONE merged op
        (ops/fused_dcore.py): a single hoisted conv stack and a single
        forward scan kernel at 3B rows (the sequential kernels are
        per-timestep latency bound, so 3B rows cost what B rows cost).
        XLA path: ONE batched critic pass over [real; fake; x_hat] — the
        forward, the GP's inner input-gradient (jax.vjp with a selection
        cotangent), and the outer parameter gradient all ride a single
        batched scan (per-sample independence makes this identical to
        separate passes)."""
        feats, real = batch["feats"], batch["poses"]
        b = real.shape[0]
        k_z, k_gp = jax.random.split(key)
        if fake is None:
            fake = jax.lax.stop_gradient(
                sample_fake(g_params, feats, k_z, forward_only=True,
                            offset=offset, device_b=device_b)
            )
        alpha = jax.vmap(lambda k: jax.random.uniform(k, (), real.dtype))(
            per_example_keys(k_gp, b, offset, device_b)
        )
        a = alpha.reshape((b,) + (1,) * (real.ndim - 1))
        x_hat = a * real + (1.0 - a) * fake

        if fused_critic_ok and not tc.joint_gp:
            from ..ops.fused_dcore import fused_d_phase, supports_d_core

            if supports_d_core(gan.discriminator, b, interpret=gen_interpret):
                s_real, s_fake, gp = fused_d_phase(
                    d_params, gan.discriminator, real, fake, x_hat,
                    feats if cond else None, interpret=gen_interpret,
                )
            else:
                # merged 3B-row kernel needs its 2B row boundary sublane-
                # aligned (b % 4 == 0); unmerged fused composition is the
                # same math with one extra forward pass
                warn_once(
                    f"merged critic-phase kernel disabled — batch {b} is not "
                    "a multiple of 4; using the unmerged fused composition"
                )
                from ..ops.fused_gp import fused_gradient_penalty

                x_rf = jnp.concatenate([real, fake], axis=0)
                f_rf = jnp.concatenate([feats] * 2, axis=0) if cond else None
                scores = fused_critic_apply(
                    d_params, gan.discriminator, x_rf, f_rf,
                    interpret=gen_interpret,
                )
                s_real, s_fake = scores[:b], scores[b:]
                gp = fused_gradient_penalty(
                    d_params, gan.discriminator, x_hat,
                    feats if cond else None, interpret=gen_interpret,
                )
        else:
            x_all = jnp.concatenate([real, fake, x_hat], axis=0)
            sel = jnp.concatenate(
                [jnp.zeros((2 * b,), real.dtype), jnp.ones((b,), real.dtype)]
            )
            if tc.joint_gp:
                # conditional-WGAN-GP: the Lipschitz bound covers the
                # JOINT (poses, audio) input. The interpolate's audio
                # coordinate runs along the same per-example line —
                # toward the rolled (mismatched) feats when the mismatch
                # class is on (the straight-line coupling between the
                # (real, matched) and (fake, mismatched) classes),
                # degenerate (constant feats) otherwise; either way the
                # penalty includes the |dD/dfeats| component that the
                # mismatch term rewards and the pose-only GP leaves
                # unbounded (the round-4 FMD-spike mechanism).
                if tc.mismatch_weight:
                    from .conditioning import mismatch_pairs

                    feats_hat = a * feats + (1.0 - a) * mismatch_pairs(feats)
                else:
                    feats_hat = feats
                f_all = jnp.concatenate([feats, feats, feats_hat], axis=0)
                scores, pullback = jax.vjp(
                    lambda x, f: disc_apply(d_params, x, f), x_all, f_all
                )
                gx, gf = pullback(sel.astype(scores.dtype))
                g_hat, gf_hat = gx[2 * b :], gf[2 * b :]
                sq = jnp.sum(g_hat * g_hat, axis=tuple(range(1, g_hat.ndim)))
                sq = sq + jnp.sum(
                    gf_hat * gf_hat, axis=tuple(range(1, gf_hat.ndim))
                )
            else:
                f_all = jnp.concatenate([feats] * 3, axis=0)
                scores, pullback = jax.vjp(
                    lambda x: disc_apply(d_params, x, f_all), x_all
                )
                (gx,) = pullback(sel.astype(scores.dtype))
                g_hat = gx[2 * b :]
                sq = jnp.sum(g_hat * g_hat, axis=tuple(range(1, g_hat.ndim)))
            norms = jnp.sqrt(sq + 1e-12)
            gp = jnp.mean((norms - 1.0) ** 2)
            s_real, s_fake = scores[:b], scores[b : 2 * b]

        loss = critic_loss(s_real, s_fake, gp, tc.lambda_gp, tc.drift_eps)
        aux = {
            "gp": gp,
            "wasserstein": jnp.mean(s_real) - jnp.mean(s_fake),
        }
        if tc.mismatch_weight:
            # matching-aware negative class (train/conditioning.py):
            # real poses, rolled audio — one extra critic pass (fused or
            # XLA, critic_scores routes it) per critic update
            from .conditioning import mismatch_pairs

            s_mis = critic_scores(d_params, real, mismatch_pairs(feats))
            loss = loss + tc.mismatch_weight * jnp.mean(s_mis)
            aux["mismatch_gap"] = jnp.mean(s_real) - jnp.mean(s_mis)
        aux["d_loss"] = loss
        return loss, aux

    def beat_weight(step):
        """Effective beat-aux weight at ``step`` (traced int is fine —
        the schedule is arithmetic, not control flow)."""
        w0 = tc.beat_loss_weight
        if not tc.beat_loss_anneal_steps or step is None:
            return w0
        frac = jnp.minimum(
            jnp.asarray(step, jnp.float32) / tc.beat_loss_anneal_steps, 1.0
        )
        return tc.beat_loss_final + (w0 - tc.beat_loss_final) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac)
        )

    def g_aux_losses(d_params, fake, real, feats, step=None):
        """Optional generator auxiliaries beyond -E[D(fake)] (score term
        handled by the caller): feature matching via one XLA critic
        feature pass (the fused critic doesn't expose conv intermediates
        — tc.feature_matching_weight defaults to 0)."""
        extra, aux = 0.0, {}
        if tc.feature_matching_weight:
            f = feats if cond else None
            _, ff = disc.apply(d_params, fake, f, return_features=True)
            _, fr = disc.apply(d_params, real, f, return_features=True)
            fm = feature_matching(jax.lax.stop_gradient(fr), ff)
            extra = tc.feature_matching_weight * fm
            aux["fm"] = fm
        if tc.beat_loss_weight:
            from .conditioning import beat_alignment_loss

            bl = beat_alignment_loss(fake, feats)
            w = beat_weight(step)
            extra = extra + w * bl
            aux["beat_loss"] = bl
            if tc.beat_loss_anneal_steps:
                aux["beat_w"] = jnp.asarray(w, jnp.float32)
        return extra, aux

    moe_on = (
        gan.generator.arch == "transformer" and gan.generator.moe_experts > 1
    )
    if moe_on and gen_apply is not None and not gen_apply_aux:
        raise ValueError(
            "gen_apply overrides cannot collect the MoE aux loss (it is "
            "sown via a mutable flax apply) — pass gen_apply_aux=True and "
            "return (poses, moe_aux) from the override, the way "
            "parallel/pp.py threads it through the pipeline schedule"
        )
    if gen_apply_aux and gen_apply is None:
        raise ValueError("gen_apply_aux=True requires a gen_apply override")
    if g_vag is not None and moe_on:
        raise ValueError(
            "g_vag overrides do not thread the MoE Switch aux — use the "
            "GPipe pp_train_step for MoE generators (parallel/pp.py)"
        )

    def g_loss_fn(g_params, d_params, batch, key, offset=0, device_b=None,
                  step=None):
        feats = batch["feats"]
        if moe_on:
            z = sample_z(key, feats.shape[0], feats.dtype, offset, device_b)
            if gen_apply is not None:
                # pipelined MoE: the override computed the (masked,
                # per-microbatch-averaged) Switch aux inside its schedule
                fake, moe_aux = gen_apply(g_params, feats, z)
            else:
                # MoE blocks sow their Switch load-balancing aux; collect
                # it with a mutable apply, add the block-mean to the loss
                fake, sown = gen.apply(
                    g_params, feats, z, mutable=["losses"]
                )
                vals = jax.tree.leaves(sown)
                moe_aux = sum(vals) / len(vals)
        else:
            fake = sample_fake(g_params, feats, key, offset=offset,
                               device_b=device_b)
        s_fake = critic_scores(d_params, fake, feats)
        loss = generator_loss(s_fake, fake, tc.continuity_weight)
        extra, aux = g_aux_losses(d_params, fake, batch["poses"], feats,
                                  step=step)
        loss = loss + extra
        if moe_on:
            loss = loss + tc.moe_aux_weight * moe_aux
            aux = dict(aux, moe_aux=moe_aux)
        return loss, {"g_loss": loss, **aux}

    def train_step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        # trace-time contract checks (SURVEY.md §5 sanitizers row): shapes
        # are validated once per compilation, free at run time
        chex.assert_rank(batch["feats"], 3)
        chex.assert_rank(batch["poses"], 3)
        chex.assert_equal_shape_prefix([batch["feats"], batch["poses"]], 2)
        chex.assert_axis_dimension(batch["poses"], 2, gan.generator.pose_dim)

        # All keys derive from replicated values (state.rng, state.step,
        # static phase tags); per-example decorrelation happens inside
        # per_example_keys via the global example index.
        next_rng, base = jax.random.split(jax.random.fold_in(state.rng, state.step))

        feats = batch["feats"]
        b = feats.shape[0]

        if tc.augment.enabled:
            # real-pose augmentation, before the critic or any aux loss
            # sees the batch
            from ..data.augment import augment_real_batch

            batch = dict(batch, poses=augment_real_batch(
                base, per_example_keys, b, batch["poses"],
                gan.generator.layout, tc.augment))

        # Dual generator pass: every fake of the step (n_critic forward-only
        # + 1 differentiable) in one fused kernel — the D updates between
        # phases never touch g_params, so the replicas are row-independent
        # and per-row bit-identical to the per-phase calls. The noise draws
        # reuse EXACTLY the keys the per-phase code derives below, so both
        # paths sample the same z.
        from ..ops.fused_gdual import fused_dual_apply, supports_dual

        K = tc.grad_accum
        if K > 1 and b % K:
            raise ValueError(
                f"grad_accum={K} does not divide the per-device batch {b}"
            )
        mb = b // K

        use_dual = K == 1 and fused_gen_ok and supports_dual(
            gan.generator, tc.n_critic * b, interpret=gen_interpret
        )
        if fused_gen_ok and K > 1:
            warn_once(
                "dual generator kernel disabled under gradient accumulation "
                "— each microbatch rides the per-phase fused scans"
            )
        elif fused_gen_ok and not use_dual:
            warn_once(
                f"dual generator kernel disabled — n_critic*batch = "
                f"{tc.n_critic * b} is not a multiple of 8; falling back to "
                "per-phase fused scans"
            )
        fakes_fwd, fake_g, pull_g = None, None, None
        if use_dual:
            zs_fwd = []
            for i in range(tc.n_critic):
                k_z, _ = jax.random.split(jax.random.fold_in(base, i))
                zs_fwd.append(sample_z(k_z, b, feats.dtype))
            z_g = sample_z(jax.random.fold_in(base, tc.n_critic), b, feats.dtype)
            (fakes_fwd, fake_g), pull_g = jax.vjp(
                lambda gp: fused_dual_apply(
                    gp, gan.generator, feats, zs_fwd, z_g,
                    interpret=gen_interpret,
                ),
                state.g_params,
            )

        def accum(loss_fn, params):
            """(aux, grads) of ``loss_fn(params, mbatch, offset)`` averaged
            over the K microbatch slices, computed sequentially in a
            lax.scan so only ONE slice's activations are ever live.

            The average IS the big-batch result: every loss term is a
            per-example mean (train/losses.py) and the slices are equal-
            size, so gradients match at reduction order; the offset keys
            each slice's RNG to its global example indices."""
            mbatches = jax.tree.map(
                lambda x: x.reshape((K, mb) + x.shape[1:]), batch
            )
            first = jax.tree.map(lambda x: x[0], mbatches)
            aux_sds = jax.eval_shape(
                lambda p, s: loss_fn(p, s, 0)[1], params, first
            )

            def body(carry, xs):
                g_acc, a_acc = carry
                mbt, off = xs
                (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mbt, off
                )
                return (
                    jax.tree.map(jnp.add, g_acc, grads),
                    jax.tree.map(jnp.add, a_acc, aux),
                ), None

            g0 = jax.tree.map(jnp.zeros_like, params)
            a0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_sds)
            offsets = jnp.arange(K, dtype=jnp.int32) * mb
            (g_sum, a_sum), _ = jax.lax.scan(body, (g0, a0), (mbatches, offsets))
            inv = 1.0 / K
            return (
                jax.tree.map(lambda a: a * inv, a_sum),
                jax.tree.map(lambda g: g * inv, g_sum),
            )

        d_params, opt_d = state.d_params, state.opt_d
        metrics = {}
        for i in range(tc.n_critic):  # static unroll — n_critic is config
            k = jax.random.fold_in(base, i)
            if K > 1:
                aux, grads = accum(
                    lambda p, mbt, off: d_loss_fn(
                        p, state.g_params, mbt, k, None, off, b
                    ),
                    d_params,
                )
            else:
                (_, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                    d_params, state.g_params, batch, k,
                    fakes_fwd[i] if use_dual else None,
                )
            grads = pmean(grads)
            updates, opt_d = tx_d.update(grads, opt_d, d_params)
            d_params = optax.apply_updates(d_params, updates)
            metrics = aux  # keep last critic iteration's metrics

        if use_dual:
            # generator loss depends on g_params only through fake_g: take
            # its gradient wrt the poses, then pull back through the dual
            # scan's custom VJP (chain kernel at B rows — the fwd rows'
            # zero cotangents are dead code to XLA)
            def g_core(fake):
                s_fake = critic_scores(d_params, fake, feats)
                loss = generator_loss(s_fake, fake, tc.continuity_weight)
                extra, aux = g_aux_losses(d_params, fake, batch["poses"], feats,
                                          step=state.step)
                return loss + extra, aux

            (g_loss_val, fm_aux), dfake = jax.value_and_grad(
                g_core, has_aux=True
            )(fake_g)
            (g_grads,) = pull_g(
                ([jnp.zeros_like(f) for f in fakes_fwd], dfake)
            )
            g_aux = {"g_loss": g_loss_val, **fm_aux}
        elif g_vag is not None:
            # hand-scheduled generator phase (parallel/pp_1f1b.py): the
            # hook computes loss AND grads itself; z comes from the same
            # key path sample_fake would use, so both schedules draw
            # identical noise
            k = jax.random.fold_in(base, tc.n_critic)
            z = sample_z(k, b, feats.dtype)
            (_, g_aux), g_grads = g_vag(state.g_params, d_params, batch, z)
        elif K > 1:
            k = jax.random.fold_in(base, tc.n_critic)
            g_aux, g_grads = accum(
                lambda p, mbt, off: g_loss_fn(p, d_params, mbt, k, off, b,
                                              step=state.step),
                state.g_params,
            )
        else:
            k = jax.random.fold_in(base, tc.n_critic)
            (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params, d_params, batch, k, step=state.step
            )
        g_grads = pmean(g_grads)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics.update(g_aux)
        metrics = {k_: pmean(v) for k_, v in metrics.items()}

        ema = state.ema_g_params
        if tc.ema_decay > 0.0:
            d_ = tc.ema_decay
            ema = jax.tree.map(lambda e, q: d_ * e + (1.0 - d_) * q,
                               ema, g_params)

        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            opt_g=opt_g,
            opt_d=opt_d,
            rng=next_rng,
            ema_g_params=ema,
        )
        return new_state, metrics

    return train_step


def jit_train_step(gan: GANConfig, tc: TrainConfig):
    """Single-device jitted step with donated state buffers."""
    return jax.jit(make_train_step(gan, tc), donate_argnums=(0,))
