"""Block-size selection against the VMEM budget.

TPU-native re-design of the reference's compile-time tile autotuner
(`run/flash_attn_unified.cu:26-79`, which searches square tiles 128→32
against a 160 KB shared-memory budget) and of the FA1 tile law
`Bc=⌈M/4d⌉, Br=min(Bc,d)` (`code/cuda_fa1/flashAttention.cu:17-18`).

On TPU the on-chip budget is VMEM (~16 MB/core vs 160 KB smem), the
compute granule is the 128×128 MXU / 8×128 VPU, and the Pallas pipeline
double-buffers every blocked input — so optimal tiles are large,
lane-aligned (multiples of 128 in the minor dim), and chosen per head-dim.
The search below plays the same role as the reference's `constexpr`
search: pick the largest hardware-aligned (block_q, block_kv) whose
working-set footprint fits a conservative VMEM budget.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

# Lane width of the VPU / MXU edge; minor-most dims should be multiples.
LANES = 128
# Sublane granule for fp32; bf16 wants 16, int8/fp8 want 32.
SUBLANES = {4: 8, 2: 16, 1: 32}

# Per-core VMEM budget (bytes) for the block-size search, and the
# scoped-VMEM limit requested from Mosaic. v5e exposes 128 MB of VMEM;
# the Mosaic default limit (~16-32 MB) leaves 2048-wide score tiles on
# the table — raising it measured +6% at the flagship config
# ((2048,2048) 157 TFLOP/s vs (1024,1024) 149). Budget < limit leaves
# headroom for the pipeline's double buffers and compiler scratch
# (mirroring the reference's 160 KB opt-in smem cap role).
DEFAULT_VMEM_BUDGET = 64 * 1024 * 1024
VMEM_LIMIT_BYTES = 100 * 1024 * 1024

SUPPORTED_HEAD_DIMS = (32, 64, 128, 256)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile configuration for the attention kernels.

    block_q / block_kv drive the forward kernel; the *_dq / *_dkv pairs
    drive the two backward kernels (which have different working sets).
    """

    block_q: int = 512
    block_kv: int = 512
    block_q_dq: int = 512
    block_kv_dq: int = 512
    block_q_dkv: int = 512
    block_kv_dkv: int = 512
    # Forward head batching: stack block_h q-heads (sharing one KV head
    # under GQA) as extra rows of the q tile. Shrinks the causal-skip
    # granularity to block_q without shrinking the per-step GEMM — the
    # short-sequence causal lever (at N=2K, 1024-blocks waste 1/3 of
    # computed work on the diagonal). Must divide the GQA group size;
    # the fwd path silently falls back to 1 when it does not.
    block_h: int = 1

    def clamp(self, seq_q: int, seq_kv: int) -> "BlockSizes":
        """Shrink blocks that exceed the actual sequence lengths."""
        def fit(b, n):
            return max(min(b, round_up(n, LANES)), LANES)
        return BlockSizes(
            block_q=fit(self.block_q, seq_q),
            block_kv=fit(self.block_kv, seq_kv),
            block_q_dq=fit(self.block_q_dq, seq_q),
            block_kv_dq=fit(self.block_kv_dq, seq_kv),
            block_q_dkv=fit(self.block_q_dkv, seq_q),
            block_kv_dkv=fit(self.block_kv_dkv, seq_kv),
            block_h=self.block_h,
        )


def _fwd_footprint_bytes(bq: int, bk: int, head_dim: int, in_bytes: int) -> int:
    """Forward working set: q/k/v blocks (double-buffered by the Pallas
    pipeline), the fp32 scores tile S [bq, bk], fp32 accumulator [bq, d],
    and fp32 m/l rows — the VMEM analog of the reference's smem layout
    struct (`flash_attn_unified.cu:83-109`)."""
    d = max(head_dim, LANES)  # minor dim padded to lane width
    q = bq * d * in_bytes
    kv = 2 * bk * d * in_bytes
    s = bq * bk * 4                 # scores + probs share the S tile
    acc = bq * d * 4
    stats = 2 * bq * LANES * 4      # m, l replicated over lanes
    out = bq * d * in_bytes
    # Pallas double-buffers blocked inputs/outputs across grid steps.
    return 2 * (q + kv + out) + s + acc + stats


def _bwd_footprint_bytes(bq: int, bk: int, head_dim: int, in_bytes: int) -> int:
    d = max(head_dim, LANES)
    tiles = (bq + 2 * bk) * d * in_bytes      # q, k, v
    do = bq * d * in_bytes
    s = 2 * bq * bk * 4                        # s/p and dp/ds tiles
    accs = 2 * bk * d * 4                      # dk, dv accumulators
    stats = 2 * bq * LANES * 4                 # lse, delta
    return 2 * (tiles + do) + s + accs + stats


def select_block_sizes(
    seq_q: int,
    seq_kv: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
    causal: bool = False,
    vmem_budget: int = DEFAULT_VMEM_BUDGET,
    candidates=(2048, 1024, 512, 256, 128),
) -> BlockSizes:
    """Pick the largest aligned (block_q, block_kv) fitting the budget.

    Role-equivalent to `find_optimal_tile_size` (flash_attn_unified.cu:
    26-54): descend through candidate tile sizes, keep the first whose
    footprint fits. KV blocks are allowed to be larger than Q blocks
    (more KV reuse per Q tile lowers HBM traffic), the opposite asymmetry
    from the reference's small-tile config — VMEM is big enough that the
    occupancy argument for small tiles does not apply on TPU.

    Measured on TPU v5e at (1,32,8192,128) bf16 (lazy-softmax kernel,
    100 MB scoped VMEM): non-causal (2048,2048) 184 TFLOP/s,
    (4096,2048) 185, (2048,4096) 185, (1024,1024) 170, (512,512) 66;
    the monster single-pass tiles lose ((2048,8192) 126 — the 64 MB
    score tile starves the pipeline). The 2048-first candidate ordering
    encodes that result.
    """
    in_bytes = jnp.dtype(dtype).itemsize
    if causal:
        # Block-granular causal skipping wastes ~block_q/2 rows of the
        # diagonal blocks' work (waste ratio ~ max(bq,bk)/N), so causal
        # prefers one step smaller: measured 142 TFLOP/s at (1024,1024)
        # vs 141 at (2048,2048) vs 86 at (512,512) (flagship causal,
        # lazy-softmax kernel; the 512 tile craters on raw rate).
        candidates = tuple(c for c in candidates if c <= 1024) or candidates
    for bq in candidates:
        for bk in candidates:
            if bk < bq:
                continue  # prefer wide-KV asymmetry first
            if _fwd_footprint_bytes(bq, bk, head_dim, in_bytes) <= vmem_budget:
                fwd = (bq, bk)
                break
        else:
            continue
        break
    else:
        fwd = (LANES, LANES)

    # Backward works best one size smaller: its working set per tile is
    # ~2.5x the forward's (s AND ds tiles, two accumulators), so 2048
    # blocks starve the pipeline (measured 99 vs 104 TFLOP/s fused step).
    bwd_candidates = tuple(c for c in candidates if c <= 1024) or candidates
    for bq in bwd_candidates:
        for bk in bwd_candidates:
            if _bwd_footprint_bytes(bq, bk, head_dim, in_bytes) <= vmem_budget:
                bwd = (bq, bk)
                break
        else:
            continue
        break
    else:
        bwd = (LANES, LANES)

    # Each backward kernel prefers a LARGE block on its own accumulator
    # dim: dQ (gridded over q, sweeping kv) wants a tall q block; dKV
    # (gridded over kv, sweeping q) wants a wide kv block. Measured
    # fused fwd+bwd at the flagship config: 144.0 TFLOP/s at
    # dq(2048,1024)+dkv(1024,2048) vs 141.3 at all-1024 (lazy-softmax
    # kernel, 3.5x-FLOPs model).
    dq_pair = (min(bwd[0] * 2, fwd[0]), bwd[1])
    if _bwd_footprint_bytes(*dq_pair, head_dim, in_bytes) > vmem_budget:
        dq_pair = bwd
    dkv_pair = (bwd[0], min(bwd[1] * 2, fwd[1]))
    if _bwd_footprint_bytes(*dkv_pair, head_dim, in_bytes) > vmem_budget:
        dkv_pair = bwd

    return BlockSizes(
        block_q=fwd[0], block_kv=fwd[1],
        block_q_dq=dq_pair[0], block_kv_dq=dq_pair[1],
        block_q_dkv=dkv_pair[0], block_kv_dkv=dkv_pair[1],
    ).clamp(seq_q, seq_kv)


@functools.cache
def default_block_sizes(seq_q: int, seq_kv: int, head_dim: int,
                        dtype_name: str = "bfloat16",
                        causal: bool = False,
                        group: int = 1) -> BlockSizes:
    """Cached head-dim dispatch (role of `flash_attn_unified.cu:545-599`'s
    runtime switch over template instantiations — here the 'instantiation'
    is a traced Pallas kernel specialization, cached by XLA).

    group = GQA q-heads per KV head; short causal sequences enable
    forward head batching (BlockSizes.block_h) when it divides group.
    """
    if head_dim not in SUPPORTED_HEAD_DIMS:
        raise ValueError(
            f"head_dim {head_dim} not in supported set {SUPPORTED_HEAD_DIMS}"
        )
    bs = select_block_sizes(
        seq_q, seq_kv, head_dim, dtype=jnp.dtype(dtype_name), causal=causal
    )
    if causal and group >= 2:
        # Head batching (BlockSizes.block_h): stack q-heads sharing one
        # KV head as extra tile rows — the per-step GEMM stays fat
        # while causal blocks shrink, and the shared diagonal pattern
        # rides the additive mask tile. Measured v5e causal GQA
        # (H=32/8, D=128, bh=4 + additive mask vs round-2 defaults):
        # 2K 91->105 (B=8: 140.6), 8K 140.7->159.1, 32K 163->175.5,
        # 128K 169->181.8 TF/s. Blocks: (512,512) at <=2K (diagonal
        # waste dominates), (1024,1024) beyond (raw rate dominates).
        bh = 1
        while bh * 2 <= min(group, 4) and group % (bh * 2) == 0:
            bh *= 2
        if bh > 1:
            bq = 512 if seq_q <= 2048 else 1024
            bs = dataclasses.replace(
                bs, block_q=min(bs.block_q, bq),
                block_kv=min(bs.block_kv, bq), block_h=bh)
    return bs


def interpret_default() -> bool:
    """Run Pallas kernels in interpreter mode when not on TPU (tests run
    on a virtual CPU mesh; TPU runs use the compiled Mosaic path)."""
    return jax.default_backend() != "tpu"
