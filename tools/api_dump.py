#!/usr/bin/env python
"""Public-API inventory dump (drift detection for bindings).

Rebuild of the reference's tools/api-dump (syn-based Rust public-API ->
Markdown, tools/api-dump/src/main.rs): walks the tensor4all_tpu package,
collects public classes/functions with signatures, and writes Markdown.

Usage: python tools/api_dump.py [output.md]
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys


def dump(package_name: str = "tensor4all_tpu") -> str:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    pkg = importlib.import_module(package_name)
    lines = [f"# {package_name} public API", ""]
    mods = [package_name]
    for m in pkgutil.walk_packages(pkg.__path__, prefix=package_name + "."):
        if ".capi" in m.name and m.name.endswith("helpers"):
            continue
        if m.name.rsplit(".", 1)[-1].startswith("lib"):
            continue  # compiled .so artifacts are not Python modules
        mods.append(m.name)
    for name in sorted(set(mods)):
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # noqa: BLE001
            lines.append(f"## {name}\n\n(import failed: {e})\n")
            continue
        pub = []
        for attr in sorted(dir(mod)):
            if attr.startswith("_"):
                continue
            obj = getattr(mod, attr)
            if getattr(obj, "__module__", None) != name:
                continue
            if inspect.isclass(obj):
                methods = [
                    f"  - `.{m}{_sig(getattr(obj, m))}`"
                    for m in sorted(dir(obj))
                    if not m.startswith("_")
                    and callable(getattr(obj, m, None))
                    and getattr(getattr(obj, m), "__qualname__", "")
                    .startswith(obj.__name__)
                ]
                pub.append(f"- class `{attr}`")
                pub.extend(methods)
            elif inspect.isfunction(obj):
                pub.append(f"- fn `{attr}{_sig(obj)}`")
        if pub:
            lines.append(f"## {name}")
            lines.append("")
            lines.extend(pub)
            lines.append("")
    return "\n".join(lines)


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


if __name__ == "__main__":
    out = dump()
    target = sys.argv[1] if len(sys.argv) > 1 else "docs/api.md"
    import os

    os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
    with open(target, "w") as f:
        f.write(out)
    print(f"wrote {target} ({len(out.splitlines())} lines)")
