"""Packed-group prefetch calls reader.read() from POOL THREADS
(datasource._read_units_prefetched), so no reader or wrapper may
mutate instance state inside read — this AST guard turns a future
'cache it on self' refactor into a test failure instead of a
concurrency heisenbug. Module-level caches are exempt: they are
GIL-atomic dict ops or explicitly locked (metamemo._LOCK)."""

from __future__ import annotations

import ast
import glob
import os

SRC = os.path.join(
    os.path.dirname(__file__), "..", "polars_readstat_spark", "sources"
)

READ_METHODS = {"read", "_read_unit", "_read_units_prefetched"}


def test_no_self_mutation_inside_reader_read():
    offenders = []
    for f in glob.glob(os.path.join(SRC, "**", "*.py"), recursive=True):
        tree = ast.parse(open(f).read())
        for cls in [
            n for n in ast.walk(tree) if isinstance(n, ast.ClassDef)
        ]:
            for fn in [
                n
                for n in cls.body
                if isinstance(n, ast.FunctionDef)
                and n.name in READ_METHODS
            ]:
                for node in ast.walk(fn):
                    if isinstance(node, (ast.Assign, ast.AugAssign)):
                        tgts = (
                            node.targets
                            if isinstance(node, ast.Assign)
                            else [node.target]
                        )
                        for t in tgts:
                            if (
                                isinstance(t, ast.Attribute)
                                and isinstance(t.value, ast.Name)
                                and t.value.id == "self"
                            ):
                                offenders.append(
                                    f"{os.path.basename(f)}:"
                                    f"{cls.name}.{fn.name} mutates "
                                    f"self.{t.attr} (line {node.lineno})"
                                )
    assert not offenders, offenders
