"""`python -m advoc_tpu.serve` — TCP streaming vocoder server (see cli.py)."""

from advoc_tpu.serve.cli import main

if __name__ == "__main__":
    main()
