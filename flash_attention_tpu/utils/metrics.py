"""Error metrics and verification gates.

TPU-native re-design of the reference's verification module (role of
`cuda_fa1/main.cu:244-363` and `run/test_flash_attn.cu:106-143`): the
symmetric relative error `|a-b| / (|a|+|b|+eps)` with a per-element report
threshold (1%) and an overall pass threshold (2%), plus the max-abs-err
metric the Triton harness uses against fp32 SDPA (`FA2-triton.py:311-323`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

# Reference gates (test_flash_attn.cu:296-305, main.cu:345-351).
REPORT_THRESHOLD = 0.01   # per-element: report offenders above 1%
PASS_THRESHOLD = 0.02     # overall: max symmetric rel-err must be < 2%
EPS = 1e-6


def symmetric_relative_error(a, b, eps: float = EPS):
    """Elementwise |a-b| / (|a| + |b| + eps), computed in float32."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.abs(a - b) / (jnp.abs(a) + jnp.abs(b) + eps)


def max_abs_error(a, b):
    """max |a - b| in float32 (the Triton harness's SDPA gate)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.max(jnp.abs(a - b))


@dataclasses.dataclass
class VerifyReport:
    """Result card for a candidate-vs-reference comparison."""

    passed: bool
    max_rel_err: float
    mean_rel_err: float
    max_abs_err: float
    num_offenders: int          # elements with rel-err > report threshold
    total_elements: int
    offenders: list             # first few (index, candidate, reference, err)
    pass_threshold: float

    def __str__(self) -> str:
        verdict = "PASS" if self.passed else "FAIL"
        lines = [
            f"[{verdict}] max_rel_err={self.max_rel_err:.6f} "
            f"(threshold {self.pass_threshold}) "
            f"mean_rel_err={self.mean_rel_err:.6f} "
            f"max_abs_err={self.max_abs_err:.6f} "
            f"offenders>{REPORT_THRESHOLD:.0%}: "
            f"{self.num_offenders}/{self.total_elements}"
        ]
        for idx, cand, ref, err in self.offenders:
            lines.append(
                f"  at {idx}: candidate={cand:.6f} reference={ref:.6f} "
                f"rel_err={err:.6f}"
            )
        return "\n".join(lines)


def verify(
    candidate,
    reference,
    *,
    pass_threshold: float = PASS_THRESHOLD,
    report_threshold: float = REPORT_THRESHOLD,
    max_reported: int = 10,
) -> VerifyReport:
    """Compare candidate vs reference with the reference repo's gates.

    Mirrors `verify_flash_attention` (main.cu:318-351): computes the
    symmetric relative error per element, collects the first few offenders
    above `report_threshold`, and passes iff the max error is below
    `pass_threshold`.
    """
    cand_dtype = jnp.asarray(candidate).dtype
    cand = np.asarray(jnp.asarray(candidate, jnp.float32))
    ref = np.asarray(jnp.asarray(reference, jnp.float32))
    if cand.shape != ref.shape:
        raise ValueError(f"shape mismatch: {cand.shape} vs {ref.shape}")

    # Hybrid rtol+atol gate: for low-precision candidates an element only
    # fails if BOTH its relative error exceeds the threshold AND its
    # absolute error exceeds a few ulps of the dtype at the tensor's
    # magnitude — a bf16 element at 1e-4 in a tensor whose scale is 5e-3
    # is below quantization resolution, and its "relative error" is
    # rounding noise, not signal. fp32 keeps the plain reference gate
    # (atol ~ 0).
    atol = 0.0
    if jnp.issubdtype(cand_dtype, jnp.floating) and \
            jnp.finfo(cand_dtype).bits < 32 and ref.size:
        atol = 3.0 * float(jnp.finfo(cand_dtype).eps) * \
            float(np.max(np.abs(ref)))

    abs_diff = np.abs(cand - ref).ravel()
    err = np.abs(cand - ref) / (np.abs(cand) + np.abs(ref) + EPS)
    flat_err = err.ravel()
    significant = abs_diff > atol
    offender_mask = (flat_err > report_threshold) & significant
    offender_idx = np.nonzero(offender_mask)[0]

    offenders = []
    for i in offender_idx[:max_reported]:
        multi = np.unravel_index(i, err.shape)
        offenders.append(
            (tuple(int(x) for x in multi), float(cand.ravel()[i]),
             float(ref.ravel()[i]), float(flat_err[i]))
        )

    # max_rel_err reports the gated value (error above quantization
    # resolution) — that is what the verdict is based on.
    gated_err = float(np.max(flat_err * significant)) if flat_err.size else 0.0
    return VerifyReport(
        passed=gated_err < pass_threshold,
        max_rel_err=gated_err,
        mean_rel_err=float(flat_err.mean()) if flat_err.size else 0.0,
        max_abs_err=float(np.max(np.abs(cand - ref))) if flat_err.size else 0.0,
        num_offenders=int(offender_mask.sum()),
        total_elements=int(flat_err.size),
        offenders=offenders,
        pass_threshold=pass_threshold,
    )


def cross_check(impls: dict, *, pass_threshold: float = PASS_THRESHOLD):
    """All-pairs comparison of named outputs (test_flash_attn.cu:259-305).

    Returns {(name_a, name_b): VerifyReport} for every unordered pair.
    """
    names = list(impls)
    reports = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            reports[(a, b)] = verify(
                impls[a], impls[b], pass_threshold=pass_threshold
            )
    return reports


def verify_low_precision(candidate, reference_hi, baseline_lo, *,
                         factor: float = 3.0, atol: float = 1e-6):
    """Gate for low-precision (bf16/fp16) kernels: the kernel's max-abs
    error vs the fp32 reference must not exceed `factor` x the error of a
    same-precision baseline (the standard upstream flash-attention gate —
    symmetric-rel-err is meaningless on near-zero bf16 outputs). The
    baseline error is floored at one ulp of the candidate dtype at the
    reference's magnitude, so a baseline that happens to round exactly
    does not make the gate unreachable.

    Returns (passed, kernel_err, baseline_err).
    """
    cand_dtype = jnp.asarray(candidate).dtype
    cand = np.asarray(jnp.asarray(candidate, jnp.float32))
    ref = np.asarray(jnp.asarray(reference_hi, jnp.float32))
    base = np.asarray(jnp.asarray(baseline_lo, jnp.float32))
    kernel_err = float(np.max(np.abs(cand - ref)))
    baseline_err = float(np.max(np.abs(base - ref)))
    if jnp.issubdtype(cand_dtype, jnp.floating):
        ulp = float(jnp.finfo(cand_dtype).eps) * float(np.max(np.abs(ref)))
    else:
        ulp = 0.0
    bound = factor * max(baseline_err, ulp) + atol
    return kernel_err <= bound, kernel_err, baseline_err
