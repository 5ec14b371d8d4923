"""Generate docs/API.md from the package's existing docstrings.

No prose is authored here — the reference doc is the docstrings the
code already carries (module headers, signatures, first paragraph of
every public callable), so it can never drift from the source without
a regeneration diff showing it.

    python tools/gen_api_docs.py        # rewrites docs/API.md
"""

from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PKG = "pydata_vector_search_spark"


def _first_para(doc: str | None) -> str:
    # no doc -> empty: a bare signature line (most such entries are
    # self-describing one-expression helpers like cosine_similarity)
    if not doc:
        return ""
    para = inspect.cleandoc(doc).split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines())


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _callables(mod):
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue   # re-exports documented at their home module
        yield name, obj


def _emit_module(out: list[str], modname: str, title: str) -> None:
    mod = importlib.import_module(modname)
    entries = list(_callables(mod))
    if not entries:
        return
    out.append(f"### `{modname}`\n")
    head = _first_para(mod.__doc__)
    if head:
        out.append(head + "\n")
    for name, obj in entries:
        if inspect.isclass(obj):
            d = _first_para(obj.__doc__)
            out.append(f"- **class `{name}`**" + (f" — {d}" if d else ""))
            for mname, m in sorted(vars(obj).items()):
                if mname.startswith("_") or not inspect.isfunction(m):
                    continue
                d = _first_para(m.__doc__)
                out.append(f"  - `{mname}{_sig(m)}`"
                           + (f" — {d}" if d else ""))
        else:
            d = _first_para(obj.__doc__)
            out.append(f"- `{name}{_sig(obj)}`" + (f" — {d}" if d else ""))
    out.append("")


def main() -> None:
    out = [
        "# API reference",
        "",
        "_Generated from source docstrings by `tools/gen_api_docs.py` —",
        "regenerate after changing any public surface; do not edit by",
        "hand._",
        "",
        "## Engine facade",
        "",
        "The one-import surface (`from pydata_vector_search_spark import",
        "Engine`). See `examples/quickstart.py` for the reference demo's",
        "three patterns in ~18 lines.",
        "",
    ]
    eng_mod = importlib.import_module(f"{PKG}.engine")
    Engine = eng_mod.Engine
    out.append(f"- **class `Engine`** — {_first_para(Engine.__doc__)}")
    for mname, m in Engine.__dict__.items():   # declaration order
        if mname.startswith("_") or not inspect.isfunction(m):
            continue
        d = _first_para(m.__doc__)
        out.append(f"  - `{mname}{_sig(m)}`" + (f" — {d}" if d else ""))
    out.append("")

    out.append("## Modules\n")
    _emit_module(out, f"{PKG}.session", "session")
    _emit_module(out, f"{PKG}.catalog", "catalog")
    for sub in ("functions", "operators", "sources", "streaming"):
        subpkg = importlib.import_module(f"{PKG}.{sub}")
        for info in sorted(pkgutil.iter_modules(subpkg.__path__)):
            if info.name.startswith("_"):
                continue
            _emit_module(out, f"{PKG}.{sub}.{info.name}", info.name)

    path = os.path.join(ROOT, "docs", "API.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    n_lines = len(out)
    print(f"wrote {path}: {n_lines} lines")


if __name__ == "__main__":
    main()
