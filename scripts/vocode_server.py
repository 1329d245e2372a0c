#!/usr/bin/env python
"""Streaming vocoder server (thin wrapper around advoc_tpu.serve.cli).

Serve:      python scripts/vocode_server.py --port 9700 [--bundle DIR]
Self-test:  python scripts/vocode_server.py --selftest 8 --pushes 10
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from advoc_tpu.serve.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
