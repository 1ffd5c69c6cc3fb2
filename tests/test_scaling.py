"""Analytic multi-host scaling model (parallel/scaling.py).

The model's inputs must be REAL: the collective-bytes test compiles the
actual shard_map'd TP decode step on the virtual mesh and checks the
optimized HLO carries exactly the Megatron-layout collectives the model
assumes (2 activation all-reduces per layer + the logits gather) — if
the sharding layout regresses, this catches it as a byte-count drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.parallel.scaling import (
    DecodeStepCosts,
    Fabric,
    hlo_collective_bytes,
    predict_dp_decode,
    predict_tp_decode,
    ring_all_reduce_time,
    tp_decode_collective_bytes,
)


def test_hlo_parser_counts_collective_bytes():
    hlo = """
  %ar = bf16[4,2048]{1,0} all-reduce(bf16[4,2048] %x), replica_groups={}
  %ag.1 = f32[8,16]{1,0} all-gather(f32[4,16] %y), dimensions={0}
  %t = (bf16[2,8]{1,0}, bf16[2,8]{1,0}) all-reduce(%a, %b)
  %not = bf16[4,4] add(bf16[4,4] %p, bf16[4,4] %q)
"""
    got = hlo_collective_bytes(hlo)
    assert got["all-reduce"] == 4 * 2048 * 2 + 2 * (2 * 8 * 2)
    assert got["all-gather"] == 8 * 16 * 4
    assert "add" not in got


def test_ring_all_reduce_model_basics():
    f = Fabric(bandwidth=100e9, latency=1e-6)
    assert ring_all_reduce_time(1000, 1, f) == 0.0
    # Bandwidth term: 2(N-1)/N of the buffer.
    t8 = ring_all_reduce_time(8_000_000, 8, f)
    assert t8 > 2 * (7 / 8) * 8e6 / 100e9
    assert t8 < 2 * (7 / 8) * 8e6 / 100e9 + 20e-6


def test_tp_decode_hlo_matches_megatron_layout():
    """Compiled TP decode on the virtual mesh: all-reduce bytes must be
    the 2-per-layer activation psums (+ small reductions), i.e. within
    [1x, 2x] of the analytic 2*L*B*dim*itemsize."""
    from flash_attention_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    tp, batch = 2, 4
    got = tp_decode_collective_bytes(cfg, tp, batch)
    expect_ar = 2 * cfg.n_layers * batch * cfg.dim * 4
    ar = got.get("all-reduce", 0)
    assert ar >= expect_ar, (got, expect_ar)
    assert ar <= 2 * expect_ar, (got, expect_ar)
    # Logits reassembly: one gather of [B, vocab/tp] (may lower as
    # all-gather or land inside the all-reduce total depending on the
    # partitioner; just require SOME reassembly traffic exists).
    total = sum(got.values())
    assert total >= expect_ar + batch * cfg.vocab_size * 4 // tp, got


def test_predicted_efficiencies_are_defensible():
    """The model's qualitative story (REPORT): 70B TP-8 rides HBM
    dominance to ~0.9; 8B TP-8 is collective-bound below it; DP is
    ~1.0. These are the recorded predictions — drift fails the test."""
    ici = Fabric(bandwidth=100e9, latency=1e-6)
    b = 32
    cost_70b = DecodeStepCosts(
        weight_bytes=70_000_000_000, kv_bytes=2_000_000_000,
        all_reduce_bytes=80 * 2 * b * 8192 * 2,
        all_gather_bytes=b * 128256 // 8 * 2,
        tp_measured=8, hbm_bw=600e9)
    eff70 = predict_tp_decode(cost_70b, 8, ici)["efficiency"]
    assert 0.85 < eff70 <= 1.0, eff70

    cost_8b = DecodeStepCosts(
        weight_bytes=8_000_000_000, kv_bytes=1_000_000_000,
        all_reduce_bytes=32 * 2 * b * 4096 * 2,
        all_gather_bytes=b * 128256 // 8 * 2,
        tp_measured=8, hbm_bw=600e9)
    eff8 = predict_tp_decode(cost_8b, 8, ici)["efficiency"]
    assert eff8 < eff70, (eff8, eff70)

    assert predict_dp_decode(4)["efficiency"] >= 0.95
