"""Minimal stdlib type gate — the mypy stand-in behind setup.cfg's [mypy].

The reference's CI runs mypy (/root/reference/setup.cfg:1-4,
requirements/requirements-dev.txt:13). This image ships no mypy and
installs are not allowed, so this module implements the highest-value
subset with ``ast`` + runtime introspection, enforced in CI
(tests/tooling/test_static_gates.py):

  1. **Public-API annotation presence** — every public (non-underscore)
     top-level function and public method of a public class under
     ``placement_tpu/`` must carry a return annotation. (Approximates
     mypy's disallow_untyped_defs for the public surface.)
  2. **Dataclass attribute validation** — attribute reads on parameters
     annotated with the framework's core dataclasses / pytree nodes
     (``EnvParams``, ``EnvState``, ``PPOConfig``, ``TrainState``,
     ``ModelConfig``...) are validated against the class's runtime
     fields, properties, and methods. Catches the attribute-typo class of
     type errors mypy would (e.g. ``params.max_componets``).
  3. **Dataclass constructor keywords** — keyword arguments of
     ``EnvParams(...)``-style constructions and ``obj.replace(field=...)``
     method calls on tracked parameters must name real fields.

Usage: python tools/typecheck.py [paths...]   (default: placement_tpu/)
"""

import ast
import dataclasses
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _known_classes():
    """The dataclass/pytree types whose attribute surface we validate."""
    sys.path.insert(0, str(REPO))
    from placement_tpu.agent.policy import ModelConfig, Policy
    from placement_tpu.agent.ppo import PPOConfig, TrainState, Transition
    from placement_tpu.env.types import EnvParams, EnvState

    out = {}
    for cls in (EnvParams, EnvState, PPOConfig, TrainState, Transition,
                ModelConfig, Policy):
        allowed = set(dir(cls))
        fields = set()
        if dataclasses.is_dataclass(cls):
            fields = {f.name for f in dataclasses.fields(cls)}
        elif hasattr(cls, "_fields"):                      # NamedTuple
            fields = set(cls._fields)
        else:
            fields = set(getattr(cls, "__annotations__", {}))
        out[cls.__name__] = (allowed | fields, fields)
    return out


def _annotation_name(node):
    """'EnvParams' from ``x: EnvParams`` / ``x: types.EnvParams`` /
    ``x: Optional[EnvParams]``."""
    if isinstance(node, ast.Name):
        return node.id
    if isinstance(node, ast.Attribute):
        return node.attr
    if isinstance(node, ast.Subscript):                    # Optional[...]
        inner = node.slice
        if isinstance(inner, (ast.Name, ast.Attribute)):
            return _annotation_name(inner)
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value.split(".")[-1].strip("'\"")
    return None


def _check_annotations(tree, rel, errors):
    def visit(body, in_public_class):
        for n in body:
            if isinstance(n, ast.ClassDef):
                visit(n.body, not n.name.startswith("_"))
            elif isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if n.name.startswith("_") or not in_public_class:
                    continue
                if "noqa" in _def_line(n):
                    continue
                if n.returns is None:
                    errors.append(
                        f"{rel}:{n.lineno}: public "
                        f"{'method' if in_public_class != 'mod' else 'function'} "
                        f"'{n.name}' lacks a return annotation")

    def _def_line(n):
        return LINES.get(id(tree), [""] * n.lineno)[n.lineno - 1]

    global LINES
    visit(tree.body, "mod")


def _assigned_names(fn):
    """Names rebound inside the function (tracking stops for those)."""
    out = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                for leaf in ast.walk(t):
                    if isinstance(leaf, ast.Name):
                        out.add(leaf.id)
        elif isinstance(node, (ast.AugAssign, ast.AnnAssign, ast.For)):
            t = node.target
            for leaf in ast.walk(t):
                if isinstance(leaf, ast.Name):
                    out.add(leaf.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.Lambda)) and node is not fn:
            # nested function/lambda params shadow the tracked name
            for a in (node.args.posonlyargs + node.args.args
                      + node.args.kwonlyargs):
                out.add(a.arg)
    return out


def _check_attributes(tree, rel, known, errors):
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        tracked = {}
        for a in (fn.args.posonlyargs + fn.args.args + fn.args.kwonlyargs):
            cls = _annotation_name(a.annotation) if a.annotation else None
            if cls in known:
                tracked[a.arg] = cls
        if not tracked:
            continue
        rebound = _assigned_names(fn)
        tracked = {k: v for k, v in tracked.items() if k not in rebound}
        for node in ast.walk(fn):
            if (isinstance(node, ast.Attribute)
                    and isinstance(node.value, ast.Name)
                    and node.value.id in tracked):
                cls = tracked[node.value.id]
                allowed, _ = known[cls]
                if node.attr not in allowed:
                    errors.append(
                        f"{rel}:{node.lineno}: '{node.value.id}.{node.attr}'"
                        f" — {cls} has no attribute '{node.attr}'")
            elif (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "replace"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id in tracked):
                # obj.replace(field=...) — the dominant construction idiom
                # for the frozen dataclasses / pytree nodes
                cls = tracked[node.func.value.id]
                _, fields = known[cls]
                for kw in node.keywords:
                    if (fields and kw.arg is not None
                            and kw.arg not in fields):
                        errors.append(
                            f"{rel}:{node.lineno}: "
                            f"{node.func.value.id}.replace({kw.arg}=...) — "
                            f"{cls} has no field '{kw.arg}'")


def _check_constructors(tree, rel, known, errors):
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        name = None
        if isinstance(node.func, ast.Name):
            name = node.func.id
        elif isinstance(node.func, ast.Attribute):
            name = node.func.attr
        if name in known:
            _, fields = known[name]
            if not fields:
                continue
            for kw in node.keywords:
                if kw.arg is not None and kw.arg not in fields:
                    errors.append(
                        f"{rel}:{node.lineno}: {name}(...{kw.arg}=...) — "
                        f"no such field")
        # (obj.replace(field=...) keyword validation lives in
        # _check_attributes, which knows the parameter's class; the
        # module-function form dataclasses.replace(x, **kw) would need
        # inference on x and is out of scope.)


LINES = {}


def check_file(path: pathlib.Path, known):
    try:
        rel = path.relative_to(REPO)
    except ValueError:            # path outside the repo root (CLI usage)
        rel = path
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]
    LINES[id(tree)] = src.splitlines()
    errors = []
    _check_annotations(tree, rel, errors)
    _check_attributes(tree, rel, known, errors)
    _check_constructors(tree, rel, known, errors)
    LINES.pop(id(tree), None)
    return errors


def run(paths):
    known = _known_classes()
    errors = []
    for p in paths:
        p = pathlib.Path(p)
        files = sorted(p.rglob("*.py")) if p.is_dir() else [p]
        for f in files:
            if "__pycache__" in str(f):
                continue
            errors.extend(check_file(f.resolve(), known))
    return errors


def main() -> int:
    paths = sys.argv[1:] or [REPO / "placement_tpu"]
    errors = run(paths)
    for e in errors:
        print(e)
    print(f"{len(errors)} issue(s)")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
