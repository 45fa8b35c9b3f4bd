"""Command-line entry point — the equivalent of ``PothosUtil``.

The reference ships a utility binary in Pothos core used for block
discovery and self-tests (``PothosUtil --self-tests`` loads every module
.so and runs the registered POTHOS_TEST_BLOCK functions; SURVEY.md §3.5).
Here:

    python -m pothoscomms_tpu catalog            # JSON block/param schema
    python -m pothoscomms_tpu list               # registered block paths
    python -m pothoscomms_tpu doc /comms/fft     # one block's schema
    python -m pothoscomms_tpu self-test          # run the pytest suite
    python -m pothoscomms_tpu bench [name ...]   # benchmark suite
"""

from __future__ import annotations

import json
import sys


def _load_registry():
    import pothoscomms_tpu.blocks  # noqa: F401 — registers everything
    from pothoscomms_tpu.core.registry import BlockRegistry

    return BlockRegistry


def cmd_list(_args):
    reg = _load_registry()
    for path in sorted(reg.paths()):
        print(path)
    return 0


def cmd_catalog(_args):
    from pothoscomms_tpu.core.introspect import catalog

    _load_registry()
    print(json.dumps(catalog(), indent=2, default=str))
    return 0


def cmd_doc(args):
    if not args:
        print("usage: python -m pothoscomms_tpu doc </comms/path> [ctor args]",
              file=sys.stderr)
        return 2
    import ast

    from pothoscomms_tpu.core.introspect import block_doc

    reg = _load_registry()

    def _coerce(a: str):
        try:
            return ast.literal_eval(a)
        except (ValueError, SyntaxError):
            return a

    try:
        blk = reg.make(args[0], *[_coerce(a) for a in args[1:]])
    except (KeyError, ValueError, TypeError) as exc:
        print(f"doc: {exc}", file=sys.stderr)
        return 2
    print(json.dumps(block_doc(blk), indent=2, default=str))
    return 0


def cmd_self_test(args):
    import os
    import subprocess
    from pathlib import Path

    tests = Path(__file__).resolve().parent.parent / "tests"
    if not tests.is_dir():
        print("self-test requires the source checkout (tests/ not packaged)",
              file=sys.stderr)
        return 2
    return subprocess.call(
        [sys.executable, "-m", "pytest", str(tests), "-q", *args],
        cwd=str(tests.parent), env=dict(os.environ),
    )


def cmd_bench(args):
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    suite = root / "benches" / "bench_suite.py"
    if not suite.exists():
        print("bench requires the source checkout (benches/ not packaged)",
              file=sys.stderr)
        return 2
    sys.path.insert(0, str(root))
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_suite", suite)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(args) or 0


COMMANDS = {
    "list": cmd_list,
    "catalog": cmd_catalog,
    "doc": cmd_doc,
    "self-test": cmd_self_test,
    "bench": cmd_bench,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    if not argv or argv[0] not in COMMANDS:
        print(__doc__, file=sys.stderr)
        return 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
