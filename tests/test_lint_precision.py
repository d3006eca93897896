"""Source lint: every jnp.dot / jnp.einsum / jnp.matmul outside kernels/
must pass an explicit ``precision=`` (or ``preferred_element_type`` for the
deliberate-bf16 paths).

Rationale: the default matmul precision is f32 on CPU but bf16 on TPU, so a
bare product in coefficient prep or state propagation is a TPU-only
accuracy bug that the CPU CI backend can never see (this is how the pilot
peak resonator lost ~50 dB of golden SNR, see ops/iir._power_stack).  The
Pallas kernels (fm_radio_tpu/kernels/) manage precision explicitly via
bf16 hi/lo splits and are exempt.
"""

import ast
import os

import pytest

PKG = os.path.join(os.path.dirname(__file__), "..", "fm_radio_tpu")
TARGETS = {"dot", "einsum", "matmul", "tensordot", "vdot"}


# lax-level products and convolutions default to bf16 on TPU exactly like
# the jnp wrappers; jnp.convolve has no precision= pre-jax-0.4-ish callers
# forget exists; the @ operator is jnp.matmul in disguise.
LAX_TARGETS = {"dot_general", "dot", "conv_general_dilated", "conv",
               "conv_with_general_padding"}
TARGETS_CONV = {"convolve", "correlate"}


def _bare_products(path):
    src = open(path).read()
    tree = ast.parse(src)
    hits = []
    for node in ast.walk(tree):
        # `a @ b` on traced arrays is jnp.matmul with default precision.
        # Only flag when neither operand is an obviously-host numpy value —
        # we can't type-infer, so flag them all; the package currently has
        # zero `@` uses outside kernels/ and that is the desired state.
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            hits.append((node.lineno, "@ (matmul operator)"))
            continue
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        name = None
        if isinstance(fn, ast.Attribute):
            base = fn.value
            if fn.attr in TARGETS or fn.attr in TARGETS_CONV:
                if isinstance(base, ast.Name) and base.id == "jnp":
                    name = fn.attr
            elif fn.attr in LAX_TARGETS:
                # jax.lax.X or lax.X
                if (isinstance(base, ast.Name) and base.id == "lax") or (
                    isinstance(base, ast.Attribute)
                    and base.attr == "lax"
                    and isinstance(base.value, ast.Name)
                    and base.value.id == "jax"
                ):
                    name = f"lax.{fn.attr}"
        if name is None:
            continue
        kws = {k.arg for k in node.keywords}
        if "precision" not in kws:
            hits.append((node.lineno, name))
    return hits


def test_no_default_precision_products():
    offenders = []
    for root, _, files in os.walk(PKG):
        if os.path.basename(root) == "kernels":
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            for lineno, name in _bare_products(p):
                offenders.append(f"{os.path.relpath(p, PKG)}:{lineno} jnp.{name}")
    assert not offenders, (
        "jnp products without explicit precision= (bf16 by default on TPU!):\n"
        + "\n".join(offenders)
    )
