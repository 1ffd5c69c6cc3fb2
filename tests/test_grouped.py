"""Grouped (ragged) expert matmul: ops/grouped.py + the dropless MoE
path (models/moe.py moe_mlp_grouped).

Self-verifying-pair pattern (SURVEY.md §4): seeded random inputs, exact
jnp reference, tight gates. Ragged edge cases exercised deliberately:
empty groups, group boundaries inside row tiles, rows beyond the data,
and the tensor-parallel base offset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.grouped import (
    grouped_int4_matmul,
    grouped_matmul,
    grouped_matmul_reference,
    grouped_quant_matmul,
    make_visit_plan,
)
from flash_attention_tpu.ops.quant_matmul import INT4_GROUP


def _sizes(rng, e, total):
    """Random group sizes summing to total, some empty."""
    cuts = np.sort(rng.integers(0, total + 1, e - 1))
    sizes = np.diff(np.concatenate([[0], cuts, [total]]))
    return jnp.asarray(sizes, jnp.int32)


def test_visit_plan_covers_all_rows(rng):
    e, bm, m_tiles = 5, 8, 7
    sizes = _sizes(rng, e, 41)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)])
    plan = np.asarray(make_visit_plan(offs, m_tiles, bm, m_tiles + e))
    offs = np.asarray(offs)
    # Every (row, its group) pair must be covered by exactly one
    # running visit of the row's tile.
    for row in range(41):
        g = int(np.searchsorted(offs[1:], row, side="right"))
        tile = row // bm
        hits = [
            v for v in range(plan.shape[0])
            if plan[v, 0] == tile and plan[v, 1] == g and plan[v, 3] == 1
        ]
        assert len(hits) == 1, (row, g, tile, plan)
    # Each tile's first visit flag appears exactly once.
    for tile in range(m_tiles):
        firsts = [(v, p) for v, p in enumerate(plan)
                  if p[0] == tile and p[2] == 1]
        assert len(firsts) == 1, (tile, plan)


@pytest.mark.parametrize("total,e,k,f", [(96, 4, 64, 96), (300, 8, 128, 160)])
def test_grouped_matmul_matches_reference(rng, total, e, k, f):
    x = jnp.asarray(rng.normal(0, 1, (total, k)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (e, k, f)), jnp.float32)
    sizes = _sizes(rng, e, total)
    # Small blocks force boundary-straddling tiles and multi-visit
    # accumulation.
    got = grouped_matmul(x, sizes, w, block_m=128, block_f=128,
                         block_k=128)
    want = grouped_matmul_reference(x, sizes, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grouped_matmul_rows_beyond_data_are_zero(rng):
    e, k, f = 3, 64, 128
    x = jnp.asarray(rng.normal(0, 1, (40, k)), jnp.float32)
    sizes = jnp.asarray([10, 0, 15], jnp.int32)   # only 25 live rows
    w = jnp.asarray(rng.normal(0, 0.1, (e, k, f)), jnp.float32)
    got = np.asarray(grouped_matmul(x, sizes, w, block_m=8))
    want = np.asarray(grouped_matmul_reference(x, sizes, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got[25:] == 0.0)


def test_grouped_matmul_base_offset(rng):
    """Tensor-parallel local band: group 0 starts at row `base`; rows
    outside the band produce zeros."""
    e_local, k, f, total = 2, 64, 128, 64
    x = jnp.asarray(rng.normal(0, 1, (total, k)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (e_local, k, f)), jnp.float32)
    sizes = jnp.asarray([12, 20], jnp.int32)
    base = 17
    got = np.asarray(
        grouped_matmul(x, sizes, w, base=base, block_m=8))
    rows = np.arange(total)
    offs = np.array([base, base + 12, base + 32])
    want = np.zeros((total, f), np.float32)
    for g in range(e_local):
        keep = (rows >= offs[g]) & (rows < offs[g + 1])
        want += np.where(keep[:, None], np.asarray(x), 0) @ np.asarray(w[g])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got[:base] == 0.0)


def test_grouped_quant_matmul_matches_dequant(rng):
    from flash_attention_tpu.models.quantized import quantize_expert_stack

    e, k, f, total = 4, 128, 256, 120
    w = rng.normal(0, 0.1, (e, k, f))
    stack = quantize_expert_stack(w, dtype=jnp.int8)
    x = jnp.asarray(rng.normal(0, 1, (total, k)), jnp.bfloat16)
    sizes = _sizes(rng, e, total)
    got = grouped_quant_matmul(x, sizes, stack.q, stack.scale,
                               block_m=64, block_f=128, block_k=128)
    want = grouped_matmul_reference(
        x.astype(jnp.float32), sizes, stack.dequant(jnp.float32))
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    assert err < 0.15, err          # bf16 activations x int8 weights


def test_grouped_int4_matmul_matches_dequant(rng):
    from flash_attention_tpu.models.quantized import quantize_expert_stack

    e, k, f, total = 3, 2 * INT4_GROUP, 128, 100
    w = rng.normal(0, 0.1, (e, k, f))
    stack = quantize_expert_stack(w, dtype="int4")
    x = jnp.asarray(rng.normal(0, 1, (total, k)), jnp.bfloat16)
    sizes = _sizes(rng, e, total)
    got = grouped_int4_matmul(x, sizes, stack.packed, stack.scales,
                              block_m=64, block_f=128, block_k=64)
    want = grouped_matmul_reference(
        x.astype(jnp.float32), sizes, stack.dequant(jnp.float32))
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    assert err < 0.15, err


def test_moe_grouped_matches_capacity_when_nothing_drops(rng):
    """Dropless grouped path == capacity path when capacity is ample
    (route_tokens' kept-gate renormalization equals top-k renorm)."""
    from flash_attention_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_mlp, moe_mlp_grouped)

    cfg = MoEConfig.tiny_moe(capacity_factor=8.0)
    params = init_moe_params(cfg, jax.random.PRNGKey(0))
    layer = params["layers"][0]
    x = jnp.asarray(rng.normal(0, 0.5, (2, 24, cfg.dim)), jnp.float32)
    y_cap, _ = moe_mlp(layer, x, cfg)
    y_grp, _ = moe_mlp_grouped(layer, x, cfg)
    np.testing.assert_allclose(
        np.asarray(y_grp), np.asarray(y_cap), rtol=2e-3, atol=2e-3)


def test_moe_dropless_forward_runs(rng):
    from flash_attention_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_forward)

    cfg = MoEConfig.tiny_moe(routing="dropless")
    params = init_moe_params(cfg, jax.random.PRNGKey(1))
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    logits, aux = moe_forward(params, tokens, cfg)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())
    assert float(aux["dropped_frac"]) == 0.0


def test_moe_grouped_quantized_stacks_close_to_dense(rng):
    from flash_attention_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_mlp_grouped)
    from flash_attention_tpu.models.quantized import quantize_moe_params

    from flash_attention_tpu.models.moe import moe_mlp

    # Gate kernel correctness, not quantization noise: the capacity
    # path dequantizes the SAME stacks (dequant-then-einsum), so the
    # two paths must agree tightly; ample capacity avoids drops.
    cfg = MoEConfig.tiny_moe(routing="dropless", capacity_factor=8.0)
    params = init_moe_params(cfg, jax.random.PRNGKey(2))
    x = jnp.asarray(rng.normal(0, 0.5, (1, 16, cfg.dim)), jnp.float32)
    for dt in (jnp.int8, "int4"):
        qlayer = quantize_moe_params(params, dtype=dt)["layers"][0]
        y_q, _ = moe_mlp_grouped(qlayer, x, cfg)
        y_ref, _ = moe_mlp(qlayer, x, cfg)
        err = np.max(np.abs(np.asarray(y_q, np.float32)
                            - np.asarray(y_ref, np.float32)))
        assert np.isfinite(err) and err < 2e-2, (dt, err)
