"""Torch converter fidelity: forward-pass equivalence, not just shapes
(SURVEY.md §4.7 and §7 hard part #5 — gate-order traps must be caught)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from music2dance_tpu.ckpt.torch_convert import (
    flax_to_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    torch_state_dict_to_flax,
)
from music2dance_tpu.ckpt.torch_ref import build_torch_models
from music2dance_tpu.models import (
    Discriminator,
    Generator,
    GANConfig,
    GeneratorConfig,
    DiscriminatorConfig,
    JointLayout,
)

LAYOUT = JointLayout(n_joints=4, joint_dim=3)
B, T, F = 3, 7, 13


def make_gan(cell):
    return GANConfig(
        generator=GeneratorConfig(
            layout=LAYOUT, feature_dim=F, noise_dim=6, enc_dim=16, enc_layers=2,
            enc_kernel=3, hidden_dim=24, rnn_layers=2, cell=cell, head_hidden=12,
        ),
        discriminator=DiscriminatorConfig(
            layout=LAYOUT, feature_dim=F, conv_dim=16, conv_layers=2,
            conv_kernel=3, hidden_dim=24, rnn_layers=2, cell=cell,
        ),
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_generator_forward_equivalence(cell):
    gan = make_gan(cell)
    gen = Generator(gan.generator)
    feats = jax.random.normal(jax.random.key(0), (B, T, F))
    z = jax.random.normal(jax.random.key(1), (B, gan.generator.noise_dim))
    params = gen.init(jax.random.key(2), feats, z)

    tg, _ = build_torch_models(gan)
    tg.load_state_dict(flax_to_torch_state_dict(params["params"]), strict=True)

    ours = np.asarray(gen.apply(params, feats, z))
    with torch.no_grad():
        theirs = tg(
            torch.from_numpy(np.asarray(feats)), torch.from_numpy(np.asarray(z))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_discriminator_forward_equivalence(cell):
    gan = make_gan(cell)
    disc = Discriminator(gan.discriminator)
    feats = jax.random.normal(jax.random.key(0), (B, T, F))
    poses = jax.random.normal(jax.random.key(1), (B, T, LAYOUT.pose_dim))
    params = disc.init(jax.random.key(2), poses, feats)

    _, td = build_torch_models(gan)
    td.load_state_dict(flax_to_torch_state_dict(params["params"]), strict=True)

    ours = np.asarray(disc.apply(params, poses, feats))
    with torch.no_grad():
        theirs = td(
            torch.from_numpy(np.asarray(poses)), torch.from_numpy(np.asarray(feats))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_round_trip_torch_to_flax_to_torch():
    gan = make_gan("gru")
    tg, td = build_torch_models(gan)  # torch-initialized weights

    gen = Generator(gan.generator)
    feats = jnp.zeros((1, 4, F))
    z = jnp.zeros((1, gan.generator.noise_dim))
    template = gen.init(jax.random.key(0), feats, z)

    flax_params = {"params": torch_state_dict_to_flax(tg.state_dict(), template["params"])}
    back = flax_to_torch_state_dict(flax_params["params"])
    for k, v in tg.state_dict().items():
        np.testing.assert_array_equal(v.numpy(), back[k].numpy(), err_msg=k)

    # and the converted flax params produce the torch forward
    fr = jax.random.normal(jax.random.key(3), (B, T, F))
    zr = jax.random.normal(jax.random.key(4), (B, gan.generator.noise_dim))
    ours = np.asarray(gen.apply(flax_params, fr, zr))
    with torch.no_grad():
        theirs = tg(torch.from_numpy(np.asarray(fr)), torch.from_numpy(np.asarray(zr))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_checkpoint_file_round_trip(tmp_path):
    gan = make_gan("gru")
    gen = Generator(gan.generator)
    disc = Discriminator(gan.discriminator)
    feats = jnp.zeros((1, 4, F))
    z = jnp.zeros((1, gan.generator.noise_dim))
    poses = jnp.zeros((1, 4, LAYOUT.pose_dim))
    gp = gen.init(jax.random.key(0), feats, z)["params"]
    dp = disc.init(jax.random.key(1), poses, feats)["params"]

    path = str(tmp_path / "ref_ckpt.pt")
    save_torch_checkpoint(path, gp, dp)
    gp2, dp2 = load_torch_checkpoint(path, gp, dp)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp),
        jax.tree_util.tree_leaves_with_path(gp2),
    ):
        np.testing.assert_array_equal(np.asarray(a), b, err_msg=jax.tree_util.keystr(pa))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(dp),
        jax.tree_util.tree_leaves_with_path(dp2),
    ):
        np.testing.assert_array_equal(np.asarray(a), b, err_msg=jax.tree_util.keystr(pa))


def test_missing_and_extra_keys_rejected():
    gan = make_gan("gru")
    tg, _ = build_torch_models(gan)
    gen = Generator(gan.generator)
    template = gen.init(
        jax.random.key(0), jnp.zeros((1, 4, F)), jnp.zeros((1, gan.generator.noise_dim))
    )["params"]

    sd = dict(tg.state_dict())
    sd.pop("step.head_out.bias")
    with pytest.raises(KeyError):
        torch_state_dict_to_flax(sd, template)

    sd = dict(tg.state_dict())
    sd["bogus.weight"] = torch.zeros(1)
    with pytest.raises(ValueError):
        torch_state_dict_to_flax(sd, template)


@pytest.mark.parametrize("autoregressive,residual", [(False, True), (False, False), (True, False)])
def test_generator_equivalence_nondefault_combos(autoregressive, residual):
    """autoregressive=False + residual_pose=True diverged in round 1: the
    torch mirror added the raw prev pose while flax adds the zeroed one
    (advisor finding, torch_ref.py GenStepTorch)."""
    gan = make_gan("gru")
    cfg = GeneratorConfig(
        **{**{f.name: getattr(gan.generator, f.name)
              for f in __import__("dataclasses").fields(GeneratorConfig)},
           "autoregressive": autoregressive, "residual_pose": residual},
    )
    gen = Generator(cfg)
    feats = jax.random.normal(jax.random.key(0), (B, T, F))
    z = jax.random.normal(jax.random.key(1), (B, cfg.noise_dim))
    params = gen.init(jax.random.key(2), feats, z)

    tg, _ = build_torch_models(GANConfig(generator=cfg, discriminator=gan.discriminator))
    tg.load_state_dict(flax_to_torch_state_dict(params["params"]), strict=True)

    ours = np.asarray(gen.apply(params, feats, z))
    with torch.no_grad():
        theirs = tg(
            torch.from_numpy(np.asarray(feats)), torch.from_numpy(np.asarray(z))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_optimizer_state_round_trip(tmp_path):
    """Adam moments survive flax -> torch -> flax, and resuming with them
    differs from resuming with zero moments (the round-1 gap)."""
    import optax
    from music2dance_tpu.ckpt.torch_convert import (
        adam_blob_from_index_format,
        adam_blob_to_index_format,
        adam_state_to_torch,
    )

    gan = make_gan("gru")
    gen = Generator(gan.generator)
    disc = Discriminator(gan.discriminator)
    feats = jax.random.normal(jax.random.key(0), (B, T, F))
    z = jax.random.normal(jax.random.key(1), (B, gan.generator.noise_dim))
    poses = jax.random.normal(jax.random.key(2), (B, T, LAYOUT.pose_dim))
    gp = gen.init(jax.random.key(3), feats, z)["params"]
    dp = disc.init(jax.random.key(4), poses, feats)["params"]

    tx = optax.adam(1e-3, b1=0.5, b2=0.9)
    opt_g, opt_d = tx.init(gp), tx.init(dp)
    # take two updates so moments are nonzero and count is 2
    for k in (5, 6):
        grads = jax.tree.map(
            lambda x: jax.random.normal(jax.random.key(k), x.shape), gp
        )
        upd, opt_g = tx.update(grads, opt_g, gp)
        gp = optax.apply_updates(gp, upd)

    path = str(tmp_path / "ckpt_opt.pt")
    save_torch_checkpoint(path, gp, dp, opt_g=opt_g, opt_d=opt_d)
    g2, d2, og2, od2 = load_torch_checkpoint(path, gp, dp, opt_g, opt_d)

    assert int(og2[0].count) == int(opt_g[0].count) == 2
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path((opt_g[0].mu, opt_g[0].nu)),
        jax.tree_util.tree_leaves_with_path((og2[0].mu, og2[0].nu)),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa)
        )

    # a further update from restored state == from original state
    grads = jax.tree.map(lambda x: jnp.ones_like(x), gp)
    u1, _ = tx.update(grads, opt_g, gp)
    u2, _ = tx.update(grads, og2, g2)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(u1),
        jax.tree_util.tree_leaves_with_path(u2),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))

    # index-format adapter round trip against the torch mirror
    tg, _ = build_torch_models(gan)
    blob = adam_state_to_torch(opt_g, gp)
    indexed = adam_blob_to_index_format(blob, tg)
    back = adam_blob_from_index_format(indexed, tg)
    assert back["step"] == blob["step"]
    for k in blob["exp_avg"]:
        np.testing.assert_array_equal(
            blob["exp_avg"][k].numpy(), back["exp_avg"][k].numpy(), err_msg=k
        )
