"""Generate HTML API documentation from the package docstrings.

The Doxygen-config analog (``/root/reference/Doxyfile``; README.md:7 —
the reference generates C++ API docs from comments). This image carries
no pdoc/sphinx, so the stdlib ``pydoc`` HTML writer does the rendering:
every module in ``dpdk_dc_sand_tpu`` is documented into ``docs/api/``
with a generated index. Run ``make docs`` (or
``python docs/generate.py``) from the repo root.
"""

from __future__ import annotations

import importlib
import pkgutil
import pydoc
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = Path(__file__).resolve().parent / "api"


def iter_module_names() -> list[str]:
    import dpdk_dc_sand_tpu

    names = ["dpdk_dc_sand_tpu"]
    for info in pkgutil.walk_packages(
        dpdk_dc_sand_tpu.__path__, prefix="dpdk_dc_sand_tpu."
    ):
        if "_dcsand_native" in info.name:  # the ctypes .so, not a module
            continue
        names.append(info.name)
    return names


def main() -> int:
    sys.path.insert(0, str(ROOT))
    OUT.mkdir(parents=True, exist_ok=True)
    written = []
    skipped = []
    for name in iter_module_names():
        try:
            mod = importlib.import_module(name)
            html = pydoc.html.page(
                pydoc.describe(mod), pydoc.html.document(mod, name)
            )
            (OUT / f"{name}.html").write_text(html, errors="replace")
            written.append(name)
        except Exception as e:  # noqa: BLE001 - optional deps may be absent
            skipped.append((name, f"{type(e).__name__}: {e}"))

    rows = "\n".join(
        f'<li><a href="{n}.html"><code>{n}</code></a> — '
        f"{(sys.modules[n].__doc__ or '').strip().splitlines()[0] if sys.modules.get(n) and sys.modules[n].__doc__ else ''}</li>"
        for n in written
    )
    skiprows = "\n".join(
        f"<li><code>{n}</code>: {why}</li>" for n, why in skipped
    )
    (OUT / "index.html").write_text(
        "<html><head><title>dpdk_dc_sand_tpu API</title></head><body>"
        "<h1>dpdk_dc_sand_tpu — API documentation</h1>"
        "<p>Generated from module docstrings (docs/generate.py, the "
        "reference's Doxyfile analog).</p>"
        f"<ul>{rows}</ul>"
        + (f"<h2>Skipped</h2><ul>{skiprows}</ul>" if skipped else "")
        + "</body></html>"
    )
    print(f"wrote {len(written)} module pages to {OUT}")
    for n, why in skipped:
        print(f"  skipped {n}: {why}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
