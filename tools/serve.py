#!/usr/bin/env python
"""Back-compat shim: the serving entry point moved into the package so a
pip install ships it (`gat_tpu/serve.py` — run as `python -m
gat_tpu.serve` or the `gat-serve` console script). This path keeps
`python tools/serve.py ...` invocations and imports working from a
checkout."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gat_tpu.serve import (  # noqa: F401,E402
    main,
    result_to_json,
    serve,
    serve_http,
    warmup,
)

if __name__ == "__main__":
    raise SystemExit(main())
