"""``python -m datamatch_spark --config job.json`` — see cli.py.

Also the spark-submit shape: ship the package with ``--py-files`` and
submit a 2-line runner (or this module's file path) as the
application."""
import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
