"""LRP rule primitives: efficient Gradient*Input rules, explicit relevance
ops, conservation checking, attention, and Pallas kernels."""

from lxt_tpu.ops import functional
from lxt_tpu.ops.check import conservation_check, conservation_error
from lxt_tpu.ops.rules import (
    divide_gradient,
    gamma_conv2d,
    gamma_linear,
    identity_rule,
    stop_gradient,
)

__all__ = [
    "functional",
    "conservation_check",
    "conservation_error",
    "divide_gradient",
    "gamma_conv2d",
    "gamma_linear",
    "identity_rule",
    "stop_gradient",
]
