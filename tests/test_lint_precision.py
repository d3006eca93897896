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


def _bare_products(path):
    tree = ast.parse(open(path).read())
    hits = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        name = None
        if isinstance(fn, ast.Attribute) and fn.attr in TARGETS:
            base = fn.value
            if isinstance(base, ast.Name) and base.id in ("jnp", "np", "numpy"):
                if base.id != "jnp":
                    continue  # host-side numpy is f64/f32, fine
                name = fn.attr
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
