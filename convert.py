"""CLI checkpoint conversion: orbax bundle <-> reference-style torch .pt.

Completes the SURVEY.md §2 C8 interop contract as a user-facing command
(the library half lives in `music2dance_tpu/ckpt/torch_convert.py`; until
now only `train.py --restore_torch` exposed one direction). A reference
user migrates in either direction with one line:

  # take a trained TPU model back to torch (.pt with G/D [+ Adam moments])
  python convert.py --ckpt runs/full_ckpt --step best --out model.pt

  # bring a reference torch checkpoint into an orbax bundle that every
  # CLI here (generate/evaluate/serve/train --restore) can load
  python convert.py --torch model.pt --preset full --out runs/imported

The torch blob layout is the reference's `torch.save({'generator': ...,
'discriminator': ...[, 'opt_g', 'opt_d']})` state-dict form; tensor
name/shape mapping is pure transposes (no gate permutation — cells use
torch gate order by construction, see `models/cells.py`).
"""

from __future__ import annotations

import os

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("ckpt", None, "orbax checkpoint bundle to export to torch")
flags.DEFINE_string(
    "step", "latest",
    "which step of --ckpt to export: a number, 'latest', or 'best' "
    "(the best-by-eval slot kept when training ran with eval enabled)")
flags.DEFINE_string("torch", None, "torch .pt checkpoint to import to orbax")
flags.DEFINE_string("preset", "full",
                    "preset naming the architecture of --torch (the .pt "
                    "carries no config; must match the reference model)")
flags.DEFINE_string("out", None, "output path: .pt file (export) or "
                    "orbax bundle directory (import)")
flags.DEFINE_bool("with_opt", True,
                  "include Adam optimizer moments in the conversion "
                  "(both directions; ignored when the source has none)")
flags.DEFINE_bool("use_ema", False,
                  "export the EMA generator weights instead of the raw "
                  "ones (eval/serving weights; implies no optimizer "
                  "moments — Adam state tracks the raw weights)")
flags.mark_flag_as_required("out")


def _export_to_torch():
    from music2dance_tpu.ckpt.orbax_io import restore_bundle
    from music2dance_tpu.ckpt.torch_convert import save_torch_checkpoint

    step = (FLAGS.step if FLAGS.step in ("latest", "best") else int(FLAGS.step))
    _, _, state = restore_bundle(FLAGS.ckpt, step=step)
    g_params = state.g_params
    # EMA weights never travel with Adam moments (the moments track the
    # raw weights; an opt_d-only blob would be silently asymmetric)
    with_opt = FLAGS.with_opt and not FLAGS.use_ema
    if FLAGS.use_ema:
        if state.ema_g_params is None:
            raise SystemExit(
                "--use_ema: this checkpoint has no EMA weights "
                "(train with ema_decay > 0)")
        g_params = state.ema_g_params
    save_torch_checkpoint(
        FLAGS.out, g_params, state.d_params,
        opt_g=state.opt_g if with_opt else None,
        opt_d=state.opt_d if with_opt else None,
    )
    print(f"wrote {FLAGS.out} (step={step}, "
          f"weights={'ema' if FLAGS.use_ema else 'raw'}, "
          f"opt={'yes' if with_opt else 'no'})")


def _import_from_torch():
    import jax
    import numpy as np

    from music2dance_tpu.ckpt.orbax_io import save_checkpoint
    from music2dance_tpu.ckpt.torch_convert import load_torch_checkpoint
    from music2dance_tpu.configs.presets import preset
    from music2dance_tpu.train import init_state

    p = preset(FLAGS.preset)
    sample = {
        "feats": np.zeros((1, 4, p.audio.n_features), np.float32),
        "poses": np.zeros((1, 4, p.gan.generator.pose_dim), np.float32),
    }
    state = init_state(jax.random.key(0), p.gan, p.train, sample)
    if FLAGS.with_opt:
        g, d, opt_g, opt_d = load_torch_checkpoint(
            FLAGS.torch, state.g_params, state.d_params,
            state.opt_g, state.opt_d,
        )
    else:
        # without optimizer templates the loader returns (g, d) only
        g, d = load_torch_checkpoint(
            FLAGS.torch, state.g_params, state.d_params)
        opt_g = opt_d = None
    state = state.replace(
        g_params=g, d_params=d,
        opt_g=opt_g if opt_g is not None else state.opt_g,
        opt_d=opt_d if opt_d is not None else state.opt_d,
    )
    save_checkpoint(FLAGS.out, state, p.gan, p.audio, p.train)
    got_opt = opt_g is not None or opt_d is not None
    print(f"wrote {os.path.abspath(FLAGS.out)} (preset={FLAGS.preset}, "
          f"opt={'yes' if got_opt else 'no — fresh Adam state'})")


def main(argv):
    del argv
    if bool(FLAGS.ckpt) == bool(FLAGS.torch):
        raise SystemExit("pass exactly one of --ckpt (export to torch) "
                         "or --torch (import to orbax)")
    if FLAGS.ckpt:
        _export_to_torch()
    else:
        _import_from_torch()


if __name__ == "__main__":
    app.run(main)
