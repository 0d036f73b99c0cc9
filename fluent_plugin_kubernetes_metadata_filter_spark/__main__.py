"""CLI: python -m fluent_plugin_kubernetes_metadata_filter_spark --sf-dir ...
Delegates to scripts/submit_job.py's argument surface."""

import sys

sys.path.insert(0, "/root/repo")

from scripts.submit_job import main

if __name__ == "__main__":
    main()
