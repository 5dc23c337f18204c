"""Launch the packaged Streamlit demo (reference demo_runner.py:20-69).

Exposed as ``visual_rag_tpu.demo()`` and the ``visual-rag-tpu-demo`` console
script.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def demo(port: int = 8501, headless: bool = True) -> int:
    try:
        import streamlit  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "The demo requires streamlit: pip install 'visual-rag-tpu[ui]'"
        ) from exc
    app_path = Path(__file__).resolve().parent.parent / "demo" / "app.py"
    if not app_path.exists():
        raise FileNotFoundError(f"demo app not found at {app_path}")
    cmd = [sys.executable, "-m", "streamlit", "run", str(app_path),
           "--server.port", str(port)]
    if headless:
        cmd += ["--server.headless", "true"]
    return subprocess.call(cmd)


def main() -> int:  # console script entry
    return demo()


if __name__ == "__main__":
    sys.exit(main())
