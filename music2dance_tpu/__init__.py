"""music2dance_tpu — a TPU-native (JAX/XLA/Pallas) music-to-dance GAN framework.

From-scratch rebuild of the capabilities of clementabary/music2dance
(see /root/repo/SURVEY.md; the reference mount was empty, so the binding
spec is /root/repo/BASELINE.json — cited as [BASELINE] throughout):

- librosa-compatible audio frontend (STFT -> mel -> MFCC/DCT -> per-clip
  normalization), implemented as MXU-friendly matmul chains and a fused
  Pallas kernel bank  (``music2dance_tpu.audio``)
- scan-based recurrent/conv sequence Generator and Discriminator over pose
  sequences  (``music2dance_tpu.models``)
- jit-compiled alternating WGAN-GP train step with truncated-BPTT support
  and shard_map data parallelism  (``music2dance_tpu.train``,
  ``music2dance_tpu.parallel``)
- batched autoregressive motion decoding  (``music2dance_tpu.infer``)
- orbax checkpoints + PyTorch checkpoint converter  (``music2dance_tpu.ckpt``)
"""

__version__ = "0.1.0"
