"""pin_hash_seed: persistent compile-cache keys must be stable across
sessions.

JAX 0.9's lowering embeds Python-hash-dependent ordering in the
serialized HLO it keys the persistent compilation cache by (measured:
two byte-identical warmups in fresh processes wrote DISJOINT
jit_chunk_fn entries; BENCH_r04.json's driver run recompiled 13
executables over a 12-entry cache). The fix: process entry points
re-exec themselves with PYTHONHASHSEED=0 before doing any JAX work, so
cache entries seeded during round work hit in the driver's bench run.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(**overrides):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONHASHSEED"}
    env.update(overrides)
    return env


def test_pin_noop_when_seed_already_fixed(monkeypatch):
    from tomatis_tpu.utils import jaxcache

    calls = []
    monkeypatch.setattr(os, "execv", lambda *a: calls.append(a))
    monkeypatch.setenv("PYTHONHASHSEED", "7")
    jaxcache.pin_hash_seed()
    assert not calls  # any fixed numeric seed is already stable
    monkeypatch.setenv("PYTHONHASHSEED", "0")
    jaxcache.pin_hash_seed()
    assert not calls


def test_pin_reexecs_with_seed_zero(monkeypatch):
    """'random' and unset both re-exec; the argv tail is passed through."""
    from tomatis_tpu.utils import jaxcache

    calls = []
    monkeypatch.setattr(os, "execv", lambda exe, args: calls.append(args))
    monkeypatch.delenv("PYTHONHASHSEED", raising=False)
    jaxcache.pin_hash_seed(["-m", "x.y", "--flag"])
    assert os.environ["PYTHONHASHSEED"] == "0"
    assert calls[-1] == [sys.executable, "-m", "x.y", "--flag"]
    monkeypatch.setenv("PYTHONHASHSEED", "random")
    jaxcache.pin_hash_seed(["a.py"])
    assert calls[-1] == [sys.executable, "a.py"]


def test_reexec_end_to_end_subprocess():
    """A real child process without a pinned seed ends up running under
    PYTHONHASHSEED=0 after pin_hash_seed."""
    code = (
        "import sys, os; sys.path.insert(0, {!r});"
        "from tomatis_tpu.utils.jaxcache import pin_hash_seed;"
        "pin_hash_seed(['-c', 'import os;"
        "print(os.environ[\"PYTHONHASHSEED\"])']);"
        "print('NOT-REEXECED')".format(REPO)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=_env(JAX_PLATFORMS="cpu"),
        capture_output=True, text=True, timeout=120)
    assert out.stdout.strip().splitlines()[-1] == "0", out.stdout


def test_bench_main_does_not_reexec_in_process(monkeypatch):
    """bench.main() is called in-process by the driver-contract tests;
    the re-exec lives only under bench's __main__ guard."""
    import ast

    with open(os.path.join(REPO, "bench.py")) as f:
        tree = ast.parse(f.read())
    main_fn = next(n for n in tree.body
                   if isinstance(n, ast.FunctionDef) and n.name == "main")
    src = ast.dump(main_fn)
    assert "pin_hash_seed" not in src
    # and the __main__ block does pin before running
    guard = [n for n in tree.body if isinstance(n, ast.If)]
    assert any("pin_hash_seed" in ast.dump(n) for n in guard)
