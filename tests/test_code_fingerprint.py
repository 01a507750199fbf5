"""Contracts for the transitive code-object fingerprint that drives
grade tainting (r9 verdict item 2): deterministic, path-independent,
sensitive to executed-code and oracle changes, insensitive to
registry ordering. No Spark session."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
)

from code_fingerprint import (  # noqa: E402
    closure_items,
    fingerprint,
    registry_fingerprints,
)

import aws_lakehouse_spark.layout as layout  # noqa: E402
from aws_lakehouse_spark.operators import joins  # noqa: E402


def test_deterministic_across_calls():
    def q(spark, sf):
        return joins.widen_if_underparallel(spark)

    assert fingerprint(q, "SELECT 1") == fingerprint(q, "SELECT 1")


def test_oracle_change_taints():
    def q(spark, sf):
        return None

    assert fingerprint(q, "SELECT 1") != fingerprint(q, "SELECT 2")


def test_reaches_function_scoped_import():
    """`from pkg.mod import fn` inside a body binds a LOCAL — the
    walker must resolve it off the bytecode, not __globals__."""

    def q(spark, sf):
        from aws_lakehouse_spark.operators.joins import (
            widen_if_underparallel,
        )

        return widen_if_underparallel(spark)

    codes, consts = closure_items(q)
    names = {c.split(b"\x1f", 1)[0].decode() for c in codes}
    assert "widen_if_underparallel" in names
    # the classifier regex is a module-level constant the closure
    # references by name — an edit to it must change the fingerprint
    assert any("_SHUFFLING_NODES" in t for t in consts)


def test_reaches_package_helpers_transitively():
    """A real registry builder: its in-package call chain (helpers of
    helpers) must land in the closure. dedup_exact -> llm.dedup
    helpers -> widen_if_underparallel -> layout.widen_if_narrow."""
    from aws_lakehouse_spark.plans import REGISTRY

    codes, _ = closure_items(REGISTRY["dedup_minhash_lsh_pairs"].fn)
    names = {c.split(b"\x1f", 1)[0].decode() for c in codes}
    assert {"widen_if_underparallel", "widen_if_narrow"} <= names


def test_module_attr_reference_reaches_module_functions():
    def q(spark, sf):
        return layout.widen_if_narrow(spark)

    codes, _ = closure_items(q)
    names = {c.split(b"\x1f", 1)[0].decode() for c in codes}
    assert "widen_if_narrow" in names


def test_local_rename_may_taint_but_logic_change_must():
    def q1(spark, sf):
        x = 1
        return x + 2

    def q2(spark, sf):
        x = 1
        return x + 3

    assert fingerprint(q1, None) != fingerprint(q2, None)


def test_registry_fingerprints_cover_every_query():
    fps = registry_fingerprints()
    from aws_lakehouse_spark.plans import REGISTRY

    assert set(fps) == set(REGISTRY)
    assert all(len(v) == 64 for v in fps.values())


def test_noncallable_default_change_taints():
    """r10 advice (medium): a `k=3`-style default knob is semantics —
    the old walker hashed only callable defaults, so flipping one
    silently escaped the taint."""

    def q1(spark, sf, k=3):
        return k

    def q2(spark, sf, k=4):
        return k

    assert fingerprint(q1, None) != fingerprint(q2, None)


def test_kwonly_default_change_taints():
    def q1(spark, sf, *, bands=16):
        return bands

    def q2(spark, sf, *, bands=8):
        return bands

    assert fingerprint(q1, None) != fingerprint(q2, None)


def test_helper_default_in_closure_taints():
    """The advice's probe: a default on a package HELPER reached
    transitively must contribute a value token."""
    from aws_lakehouse_spark.plans import REGISTRY

    _, consts = closure_items(REGISTRY["dedup_minhash_signature"].fn)
    assert any(".default[" in t for t in consts)


def test_module_walk_hashes_upper_constants():
    """r10 advice: `mod.CONST` access reads a module attribute the
    name walk can't resolve — walking a referenced package module
    must emit value tokens for its UPPER_CASE non-callable globals
    (and never path-dependent dunders like __file__)."""

    def q(spark, sf):
        return layout.widen_if_narrow(spark)

    _, consts = closure_items(q)
    mod_tokens = [t for t in consts if t.startswith("aws_lakehouse_spark.layout.")]
    assert any("_BYTE_SUFFIXES" in t for t in mod_tokens)
    assert not any("__file__" in t for t in consts)
    assert not any("__doc__" in t for t in consts)


def test_function_scoped_import_module_as_alias():
    """r10 advice (low): function-scoped `import pkg.mod as alias`
    compiles to IMPORT_NAME pkg.mod + IMPORT_FROM mod; the submodule
    is often not yet an attribute of the parent, so the walker must
    fall back to importing it."""

    # exec in an EMPTY namespace: this test-module's own top-level
    # `import aws_lakehouse_spark.layout as layout` would otherwise
    # let the __globals__ name walk mask a broken bytecode path
    ns: dict = {}
    exec(
        "def q(spark, sf):\n"
        "    import aws_lakehouse_spark.layout as lay\n"
        "    return lay.widen_if_narrow(spark)\n",
        ns,
    )
    codes, _ = closure_items(ns["q"])
    names = {c.split(b"\x1f", 1)[0].decode() for c in codes}
    assert "widen_if_narrow" in names
