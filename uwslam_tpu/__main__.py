"""`python -m uwslam_tpu` — the CLI entry point."""
from .cli.main import main

raise SystemExit(main())
