"""PyTorch mirror of the G/D architecture.

Two jobs (SURVEY.md §4.7, §7 stage 8):
1. Checkpoint-converter counterpart: module names are chosen so the torch
   ``state_dict()`` keys map 1:1 onto the flax param tree paths
   (``torch_convert.py`` is then pure key renaming + transposes, never a
   gate reorder — the cells already share torch's gate order).
2. Measurable stand-in for the reference CPU baseline: the reference
   trains this class of model single-process on CPU [BASELINE], so timing
   this torch implementation on CPU gives the "reference CPU GAN
   steps/sec" denominator used by bench.py until the real reference
   becomes obtainable (it was unobtainable this round — SURVEY.md §0).

Everything here is torch-idiomatic for CPU research code: python loop over
timesteps (the AR feedback forces it), Conv1d stacks, double-backward
gradient penalty.
"""

from __future__ import annotations

import torch
import torch.nn as nn

from ..models.configs import DiscriminatorConfig, GANConfig, GeneratorConfig


def _same_conv1d(in_ch: int, out_ch: int, k: int) -> nn.Conv1d:
    if k % 2 != 1:
        raise ValueError("torch mirror requires odd conv kernels (SAME padding)")
    return nn.Conv1d(in_ch, out_ch, k, padding=k // 2)


class CompatGRUCell(nn.Module):
    """Matches models.cells.GRUCell: gi precomputed by caller."""

    def __init__(self, hidden: int):
        super().__init__()
        self.hh = nn.Linear(hidden, 3 * hidden)

    def forward(self, h, gi):
        gh = self.hh(h)
        i_r, i_z, i_n = gi.chunk(3, dim=-1)
        h_r, h_z, h_n = gh.chunk(3, dim=-1)
        r = torch.sigmoid(i_r + h_r)
        z = torch.sigmoid(i_z + h_z)
        n = torch.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class CompatLSTMCell(nn.Module):
    def __init__(self, hidden: int):
        super().__init__()
        self.hh = nn.Linear(hidden, 4 * hidden)

    def forward(self, hc, gi):
        h, c = hc
        gh = self.hh(h)
        i_i, i_f, i_g, i_o = gi.chunk(4, dim=-1)
        h_i, h_f, h_g, h_o = gh.chunk(4, dim=-1)
        i = torch.sigmoid(i_i + h_i)
        f = torch.sigmoid(i_f + h_f)
        g = torch.tanh(i_g + h_g)
        o = torch.sigmoid(i_o + h_o)
        c_new = f * c + i * g
        return o * torch.tanh(c_new), c_new


class CompatRNNCore(nn.Module):
    def __init__(self, hidden: int, layers: int, cell: str):
        super().__init__()
        self.hidden, self.layers, self.cell = hidden, layers, cell
        gates = 3 if cell == "gru" else 4
        for l in range(layers):
            cell_mod = CompatGRUCell(hidden) if cell == "gru" else CompatLSTMCell(hidden)
            setattr(self, f"cell_l{l}", cell_mod)
            if l > 0:
                setattr(self, f"ih_l{l}", nn.Linear(hidden, gates * hidden))

    def forward(self, state, gi0):
        """state: list of h (gru) or list of (h, c) (lstm); one timestep."""
        x_proj = gi0
        new_state = []
        below = None
        for l in range(self.layers):
            cell = getattr(self, f"cell_l{l}")
            if self.cell == "gru":
                h_new = cell(state[l], x_proj)
                new_state.append(h_new)
                below = h_new
            else:
                h_new, c_new = cell(state[l], x_proj)
                new_state.append((h_new, c_new))
                below = h_new
            if l + 1 < self.layers:
                x_proj = getattr(self, f"ih_l{l + 1}")(below)
        return new_state, below

    def init_state(self, batch: int):
        z = torch.zeros(batch, self.hidden)
        if self.cell == "gru":
            return [z.clone() for _ in range(self.layers)]
        return [(z.clone(), z.clone()) for _ in range(self.layers)]


class GenStepTorch(nn.Module):
    """Mirror of models.generator.GeneratorStep (flax scope 'step')."""

    def __init__(self, cfg: GeneratorConfig):
        super().__init__()
        gates = 3 if cfg.cell == "gru" else 4
        self.cfg = cfg
        self.ih0_pose = nn.Linear(cfg.pose_dim, gates * cfg.hidden_dim, bias=False)
        self.core = CompatRNNCore(cfg.hidden_dim, cfg.rnn_layers, cfg.cell)
        self.head_fc = nn.Linear(cfg.hidden_dim, cfg.head_hidden)
        self.head_out = nn.Linear(cfg.head_hidden, cfg.pose_dim)

    def forward(self, state, prev_pose, gi_static_t):
        cfg = self.cfg
        prev = prev_pose if cfg.autoregressive else torch.zeros_like(prev_pose)
        gi0 = gi_static_t + self.ih0_pose(prev)
        state, h_top = self.core(state, gi0)
        out = self.head_out(torch.relu(self.head_fc(h_top)))
        # residual adds the SAME (zeroed when not autoregressive) prev the
        # projection saw — matches flax GeneratorStep for every config combo
        pose = prev + out if cfg.residual_pose else out
        return state, pose


class TorchGeneratorEncoder(nn.Module):
    def __init__(self, cfg: GeneratorConfig):
        super().__init__()
        in_ch = cfg.feature_dim
        for l in range(cfg.enc_layers):
            setattr(self, f"conv_{l}", _same_conv1d(in_ch, cfg.enc_dim, cfg.enc_kernel))
            in_ch = cfg.enc_dim
        self.n_layers = cfg.enc_layers

    def forward(self, feats):  # [B, T, F]
        x = feats.transpose(1, 2)  # conv1d wants [B, C, T]
        for l in range(self.n_layers):
            x = torch.relu(getattr(self, f"conv_{l}")(x))
        return x.transpose(1, 2)


class TorchGenerator(nn.Module):
    def __init__(self, cfg: GeneratorConfig):
        super().__init__()
        gates = 3 if cfg.cell == "gru" else 4
        self.cfg = cfg
        self.encoder = TorchGeneratorEncoder(cfg)
        self.ih0_static = nn.Linear(cfg.enc_dim + cfg.noise_dim, gates * cfg.hidden_dim)
        self.step = GenStepTorch(cfg)

    def forward(self, feats, z, tf_poses=None):  # [B,T,F], [B,Z]
        b, t, _ = feats.shape
        enc = self.encoder(feats)
        z_seq = z[:, None, :].expand(b, t, z.shape[-1])
        gi_static = self.ih0_static(torch.cat([enc, z_seq], dim=-1))

        state = self.step.core.init_state(b)
        prev_pose = torch.zeros(b, self.cfg.pose_dim)
        poses = []
        for i in range(t):
            prev_in = tf_poses[:, i] if tf_poses is not None else prev_pose
            state, pose = self.step(state, prev_in, gi_static[:, i])
            prev_pose = pose
            poses.append(pose)
        return torch.stack(poses, dim=1)


class DiscStepTorch(nn.Module):
    def __init__(self, cfg: DiscriminatorConfig):
        super().__init__()
        self.core = CompatRNNCore(cfg.hidden_dim, cfg.rnn_layers, cfg.cell)
        self.score = nn.Linear(cfg.hidden_dim, 1)

    def forward(self, state, gi0_t):
        state, h_top = self.core(state, gi0_t)
        return state, self.score(h_top)


class TorchDiscriminator(nn.Module):
    def __init__(self, cfg: DiscriminatorConfig):
        super().__init__()
        gates = 3 if cfg.cell == "gru" else 4
        self.cfg = cfg
        in_ch = cfg.pose_dim + (cfg.feature_dim if cfg.conditional else 0)
        for l in range(cfg.conv_layers):
            setattr(self, f"conv_{l}", _same_conv1d(in_ch, cfg.conv_dim, cfg.conv_kernel))
            in_ch = cfg.conv_dim
        self.ih0 = nn.Linear(cfg.conv_dim, gates * cfg.hidden_dim)
        self.step = DiscStepTorch(cfg)

    def forward(self, poses, feats=None):
        cfg = self.cfg
        x = poses
        if cfg.conditional:
            x = torch.cat([poses, feats], dim=-1)
        x = x.transpose(1, 2)
        for l in range(cfg.conv_layers):
            x = torch.nn.functional.leaky_relu(getattr(self, f"conv_{l}")(x), 0.2)
        x = x.transpose(1, 2)
        gi = self.ih0(x)  # [B, T, G*H]

        b, t = poses.shape[:2]
        state = self.step.core.init_state(b)
        scores = []
        for i in range(t):
            state, s = self.step(state, gi[:, i])
            scores.append(s)
        return torch.stack(scores, dim=1).mean(dim=(1, 2))  # [B]


def build_torch_models(gan: GANConfig) -> tuple[TorchGenerator, TorchDiscriminator]:
    return TorchGenerator(gan.generator), TorchDiscriminator(gan.discriminator)
