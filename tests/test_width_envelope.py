"""Width envelope of the fused kernel bank.

The kernels hold all scan weights VMEM-resident; at hidden=2048 (GRU
bf16) the dual-VJP kernel was measured to need 89 MB against the 64 MB
scoped limit (compile-time OOM on hardware — benchmarks/
run_width_scaling.py). supports_* must reject such widths so wide models
fall back to the XLA path loudly instead of failing in Mosaic.
"""

import dataclasses

from music2dance_tpu.models import full_gan
from music2dance_tpu.ops.fused_critic import why_not_fused_critic
from music2dance_tpu.ops.fused_generator import why_not_fused


def _wide(dtype, hidden):
    gan = full_gan(dtype=dtype)
    g = dataclasses.replace(gan.generator, hidden_dim=hidden,
                            head_hidden=max(256, hidden // 2))
    d = dataclasses.replace(gan.discriminator, hidden_dim=hidden)
    return g, d


def test_width_1024_supported():
    g, d = _wide("bfloat16", 1024)  # measured: compiles + runs on TPU
    assert why_not_fused(g, interpret=False) is None
    assert why_not_fused_critic(d, interpret=False) is None


def test_width_2048_generator_rejected():
    g, _ = _wide("bfloat16", 2048)  # measured: VMEM OOM at compile
    reason = why_not_fused(g, interpret=False)
    assert reason is not None and "too wide" in reason


def test_width_2048_f32_critic_rejected():
    _, d = _wide("float32", 2048)
    reason = why_not_fused_critic(d, interpret=False)
    assert reason is not None and "too wide" in reason


def test_width_check_skipped_in_interpret_mode():
    # interpret mode has no VMEM; CPU equivalence tests keep running at
    # any width
    g, d = _wide("bfloat16", 4096)
    assert why_not_fused(g, interpret=True) is None
    assert why_not_fused_critic(d, interpret=True) is None
