"""Training hyperparameter configuration.

The objective family is pinned by [BASELINE]: "alternating GAN train step
(G loss, D loss, gradient penalty)" — i.e. WGAN-GP. Exact hyperparameters
are unknowable this round (empty reference mount, SURVEY.md §0); defaults
follow the WGAN-GP paper conventions (lambda=10, Adam(0.5/0.9)) and every
value is config-driven.
"""

from __future__ import annotations

import dataclasses

from ..data.augment import AugmentConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    clip_seconds: float = 6.0
    # optimizers
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    # lr schedule: "constant" (reference-class default) or "cosine"
    # (decay to lr*lr_final_frac over lr_decay_steps — GAN plateaus like
    # the beat-corpus FMD floor respond to late-stage decay)
    lr_schedule: str = "constant"
    lr_decay_steps: int = 10_000
    lr_final_frac: float = 0.1
    # global-norm gradient clipping (0 = off, the reference-class default;
    # an untrained recurrent chain can emit O(1e3) gradients — see
    # benchmarks/run_tpu_parity.py notes — and clipping tames the first
    # few hundred steps without touching the converged regime)
    grad_clip_norm: float = 0.0
    # EMA of the generator params (0 = off): the averaged weights are
    # what evaluation/serving should use in a GAN (the instantaneous
    # params oscillate with the adversarial game); stored in
    # TrainState.ema_g_params and preferred by Evaluator and the
    # inference API when present
    ema_decay: float = 0.0
    # objective
    lambda_gp: float = 10.0
    n_critic: int = 1              # D updates per alternating step
    drift_eps: float = 0.0         # optional critic drift term e*E[D(real)^2]
    continuity_weight: float = 0.0  # optional G smoothness aux loss
    feature_matching_weight: float = 0.0  # optional MelGAN-style G aux:
    #   L1 between critic conv features of real vs fake (losses.
    #   feature_matching). >0 adds one XLA critic feature pass per G
    #   update (the fused critic path doesn't expose conv intermediates)
    mismatch_weight: float = 0.0   # matching-aware critic term: real
    #   poses paired with rolled (wrong) audio scored as an extra fake
    #   class, weight * E[D(real, wrong_audio)] added to the critic loss
    #   — forces the critic (and through it, G) to use the audio
    #   (train/conditioning.py). Requires a conditional critic.
    joint_gp: bool = False         # conditional-WGAN-GP completeness: the
    #   gradient penalty bounds the critic over the JOINT (poses, audio)
    #   input — sqrt(|dD/dposes|^2 + |dD/dfeats|^2) at the interpolates —
    #   instead of the pose direction only. The round-4 mismatch runs
    #   destabilized (FMD spikes to O(10^3)) exactly because the
    #   mismatch class rewards audio-sensitivity that the pose-only GP
    #   never bounds: the critic is Lipschitz in poses but unbounded in
    #   feats. With mismatch on, the audio coordinate interpolates
    #   real->rolled feats on the same per-example line as the poses
    #   (the WGAN-GP straight-line coupling, in the joint input space).
    #   XLA critic phase only (the fused GP kernels differentiate wrt
    #   poses); requires a conditional critic.
    beat_loss_weight: float = 0.0  # G aux: differentiable twin of the
    #   eval beat-alignment metric (negated max lag-windowed correlation
    #   between generated speed envelope and the MFCC-c0 onset proxy) —
    #   train/conditioning.beat_alignment_loss
    beat_loss_final: float = 0.0   # annealed floor for the beat aux (used
    #   only when beat_loss_anneal_steps > 0)
    beat_loss_anneal_steps: int = 0  # >0: cosine-anneal the beat aux
    #   weight from beat_loss_weight (step 0) to beat_loss_final over
    #   this many steps, then hold. The round-4 lever sweep showed a
    #   constant strong weight (0.5) teaches alignment but wrecks
    #   fidelity while a constant weak one (0.05) never teaches it —
    #   annealing trains the coupling early and lets the adversarial
    #   loss pull the motion back onto the manifold (RESULTS.md round 5)
    moe_aux_weight: float = 0.01   # Switch load-balancing aux weight when
    #   the generator uses MoE blocks (generator.moe_experts > 1); the
    #   aux is the block-mean of E*sum_e f_e*P_e (1.0 at perfect balance)
    # gradient accumulation (1 = off): each optimizer update averages
    # gradients over grad_accum microbatch slices of the step's batch,
    # computed sequentially inside a lax.scan — peak activation memory
    # drops to one slice's worth while the update is EXACTLY the
    # big-batch update (every loss term is a per-example mean, and the
    # per-example RNG keys are global-index-derived, so slicing changes
    # nothing but reduction order — tests/test_grad_accum.py). The one
    # exception: a MoE generator's Switch aux is a per-microbatch
    # statistic (f_e*P_e is nonlinear in the batch), so with MoE the
    # aux regularizer is averaged per-slice rather than batch-global.
    # Mutually exclusive with TBPTT (its window scan already bounds
    # live memory; compose windows instead).
    grad_accum: int = 1
    # truncated BPTT (0 = disabled; BASELINE config #4 uses 30 s clips)
    tbptt_window: int = 0
    tbptt_remat: bool = False      # jax.checkpoint each window update
    #   (recompute instead of storing per-window activations — trades ~1
    #   extra forward per window for O(n_windows) less live memory)
    # checkpointing / logging / eval cadence
    ckpt_every: int = 500
    ckpt_keep: int = 3             # step-numbered history depth (orbax GC)
    best_metric: str = "fmd"       # eval metric the best/ checkpoint slot
    #   tracks (any Evaluator key: fmd, beat_alignment, diversity, ...).
    #   A GAN's best checkpoint is rarely its last; WHICH metric defines
    #   "best" depends on the goal — fidelity runs keep the fmd minimum,
    #   conditioning runs (round 5) keep the beat_alignment maximum.
    best_mode: str = "min"         # "min" | "max" for best_metric
    best_fmd_gate: float = 0.0     # >0: an eval is eligible for the best/
    #   slot only when its fmd <= this. Guards metric-maximizing slots
    #   against pre-convergence garbage: an off-manifold generator can
    #   score a high "beat alignment" on degenerate motion (measured:
    #   the moe_cond run's step-500 eval read alignment 0.395 at FMD
    #   7989), so conditioning runs gate the alignment maximum at
    #   data-manifold fidelity (e.g. --best_fmd_gate 1.0).
    # size-aware checkpoint cadence: hold checkpoint TRAFFIC (state bytes
    # per training step) at or below this budget by raising ckpt_every
    # for big states. The device->host fetch of the state is what an
    # async save actually costs the loop (round-3 finding: the ~320 MB
    # attention TrainState over this container's ~28.5 MB/s tunnel spent
    # ~11 s of link time per ~22 s chunk at ckpt_every=500, sustaining
    # 12-16 steps/s against the 22.4 bench) — and that cost scales with
    # state size while the default cadence didn't. The default budget is
    # the recurrent flagship's proven rate (~30 MB / 500 steps ≈ 60 KB/
    # step, which sustained 148 steps/s with saves on), so small models
    # keep their cadence and the transformer's rises to ~5000
    # automatically. 0 disables (ckpt_every is used verbatim — the
    # library default, so programmatic configs behave exactly as
    # written); the train.py CLI turns the budget ON whenever
    # --ckpt_every is left at its size-aware default.
    ckpt_bytes_per_step: float = 0.0
    log_every: int = 50
    eval_every: int = 0            # held-out eval cadence (0 = disabled)
    # failure detection: halt when a fetched loss/GP goes non-finite
    # (checked at the log cadence — free: the metrics are fetched there
    # anyway). An emergency checkpoint is written first when a ckpt_dir is
    # configured, so the run is inspectable/resumable from just before the
    # blow-up instead of silently training on NaNs for hours.
    nan_guard: bool = True
    # on-device pose augmentation of the REAL motion inside the jitted
    # step (data/augment.py: rotation about the up axis, mirroring,
    # scale jitter, coordinate noise) — all off by default; applies
    # identically across input modes and under DP (per-example global-
    # index keys), once per clip (before TBPTT windowing)
    augment: AugmentConfig = AugmentConfig()
