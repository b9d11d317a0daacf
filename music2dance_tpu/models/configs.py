"""Model configuration dataclasses.

Everything is config-driven (SURVEY.md §7 "hard parts" #6: keep model/loss
code config-driven so a differing real reference architecture is absorbed
by config changes, not rewrites). The named presets mirror BASELINE.json:
``tiny`` = "1-layer recurrent G+D" (config #2), ``full`` = "full reference
G/D architecture" (config #3).

The joint layout is configurable; the reference layout is unknowable this
round (empty mount, SURVEY.md §0), so the default is 23 joints x 3D,
recorded in the checkpoint so converted checkpoints carry their layout.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class JointLayout:
    """Pose output contract: [T, n_joints, joint_dim] frames [BASELINE]."""

    n_joints: int = 23
    joint_dim: int = 3

    @property
    def pose_dim(self) -> int:
        return self.n_joints * self.joint_dim


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    layout: JointLayout = JointLayout()
    feature_dim: int = 20          # = AudioConfig.n_features
    noise_dim: int = 32            # per-sequence latent z
    # model family: "rnn" (reference-parity recurrent scan + Pallas
    # kernel bank) | "transformer" (causal attention, parallel over
    # time — models/transformer.py)
    arch: str = "rnn"
    # conv audio encoder (runs over the full sequence, outside the scan)
    enc_dim: int = 128
    enc_layers: int = 2
    enc_kernel: int = 5
    # recurrent core (arch="rnn"); hidden_dim doubles as the
    # transformer's d_model
    hidden_dim: int = 512
    rnn_layers: int = 2
    cell: str = "gru"              # "gru" | "lstm" (torch-compatible gate order)
    # attention stack (arch="transformer"); 4 heads at d_model 512 give
    # head_dim 128 — one full TPU lane register, flash-kernel friendly
    tr_blocks: int = 4
    tr_heads: int = 4
    tr_mlp_ratio: int = 4
    attn_impl: str = "auto"        # "auto" | "xla" | "flash" | "flash2"
    #   (models/transformer.py routing; "flash2" = the second-order-
    #   capable core in ops/flash2.py — the only flash a WGAN-GP critic
    #   can ride)
    # mixture-of-experts MLP (arch="transformer" only): moe_experts > 1
    # replaces every block's dense MLP with a top-k routed expert bank
    # (models/transformer.py MoEMLP — GShard dense-dispatch formulation;
    # expert weights stack on a leading [E, ...] dim that the expert
    # mesh axis shards, parallel/ep.py). 0/1 = dense MLP.
    moe_experts: int = 0
    moe_topk: int = 2              # experts per token (<= moe_experts)
    moe_capacity: float = 1.25     # per-expert slots = ceil(cap*topk*T/E);
    #   tokens over capacity pass through the block's residual unchanged
    head_hidden: int = 256
    # structural conditioning (round 5): append the causal positive flux
    # of MFCC c0 as an explicit onset input channel before the audio
    # encoder (models/generator.append_onset_channel). Plain-step + full
    # clip decode only — TBPTT windows and streaming sessions would see
    # a different channel at window/chunk boundaries, so both gate it
    # out loudly.
    onset_channel: bool = False
    # FiLM conditioning (arch="transformer" only, round 5): every
    # attention block's two pre-LN activations are modulated per frame
    # by (1 + gamma) * h + beta, with gamma/beta projected from the
    # audio encoding (zero-init projections — identity at init, the
    # DiT/adaLN pattern). Makes audio-dependence STRUCTURAL inside
    # every block instead of only at the input projection: the
    # recurrent family's onset channel buys cheap beat-gating through
    # pose feedback, which the feedback-free transformer lacks
    # (measured: runs/moe_cond alignment 0.092 under the full loss
    # recipe). Offline decode only (attn_stream gates it).
    film_cond: bool = False
    residual_pose: bool = True     # predict pose deltas, integrate over time
    autoregressive: bool = True    # feed previous pose back into the core
    dtype: str = "float32"         # compute dtype ("bfloat16" for MXU speed);
                                   # params and losses stay float32

    @property
    def pose_dim(self) -> int:
        return self.layout.pose_dim


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    layout: JointLayout = JointLayout()
    feature_dim: int = 20
    conditional: bool = True       # condition the critic on audio features
    # model family: "rnn" (recurrent/TCN critic) | "transformer"
    # (conv front end + bidirectional attention — models/transformer.py)
    arch: str = "rnn"
    # attention stack (arch="transformer"); see GeneratorConfig
    tr_blocks: int = 4
    tr_heads: int = 4
    tr_mlp_ratio: int = 4
    attn_impl: str = "auto"        # "auto" | "xla" | "flash" | "flash2";
    #   the critic's "auto" routes to flash2 at T >= 256 (ops/flash2.py)
    # temporal conv stack
    conv_dim: int = 128
    conv_layers: int = 2
    conv_kernel: int = 5
    conv_dilation: int = 1         # >1: dilated (TCN-style) receptive field
    # recurrent core; rnn_layers=0 selects the conv-only (TCN) critic,
    # whose GP second-order path is scan-free (pure MXU)
    hidden_dim: int = 512
    rnn_layers: int = 1
    cell: str = "gru"
    # multi-scale critic ensemble (MelGAN-pattern, PAPERS.md): scale s
    # scores the sequences avg-pooled by 2^s along time, each scale with
    # its own parameters; the score is the scale mean. Requires the TCN
    # family (rnn_layers == 0) — conv critics are what the pattern is
    # built from, and it keeps recurrent carries single-scale.
    n_scales: int = 1
    dtype: str = "float32"         # compute dtype; params/losses stay float32

    @property
    def pose_dim(self) -> int:
        return self.layout.pose_dim


@dataclasses.dataclass(frozen=True)
class GANConfig:
    generator: GeneratorConfig = GeneratorConfig()
    discriminator: DiscriminatorConfig = DiscriminatorConfig()


def tiny_gan(feature_dim: int = 20, layout: JointLayout = JointLayout()) -> GANConfig:
    """BASELINE config #2: 1-layer recurrent G+D (degenerate but meaningful)."""
    return GANConfig(
        generator=GeneratorConfig(
            layout=layout, feature_dim=feature_dim, noise_dim=8,
            enc_dim=32, enc_layers=1, hidden_dim=64, rnn_layers=1,
            head_hidden=32,
        ),
        discriminator=DiscriminatorConfig(
            layout=layout, feature_dim=feature_dim,
            conv_dim=32, conv_layers=1, hidden_dim=64, rnn_layers=1,
        ),
    )


def full_gan(
    feature_dim: int = 20,
    layout: JointLayout = JointLayout(),
    dtype: str = "float32",
) -> GANConfig:
    """BASELINE config #3: the full G/D architecture.

    ``dtype="bfloat16"`` selects mixed precision: bf16 compute in G and D
    (single-pass MXU matmuls, fused kernel included), f32 params, losses,
    poses and optimizer states.
    """
    return GANConfig(
        generator=GeneratorConfig(layout=layout, feature_dim=feature_dim, dtype=dtype),
        discriminator=DiscriminatorConfig(layout=layout, feature_dim=feature_dim, dtype=dtype),
    )


def transformer_gan(
    feature_dim: int = 20,
    layout: JointLayout = JointLayout(),
    dtype: str = "float32",
) -> GANConfig:
    """The attention family at flagship scale (models/transformer.py):
    causal-attention G + attention critic, d_model matching the full
    preset's hidden_dim, parallel over time end to end."""
    return GANConfig(
        generator=GeneratorConfig(
            layout=layout, feature_dim=feature_dim, dtype=dtype,
            arch="transformer",
        ),
        discriminator=DiscriminatorConfig(
            layout=layout, feature_dim=feature_dim, dtype=dtype,
            arch="transformer",
        ),
    )
