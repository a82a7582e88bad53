"""Headline-crawl-only bench child process (used by ``bench.py --scaling``).

Fresh interpreter → fresh ``ray.init(num_cpus=$RAY_GRAFT_CPUS)``; prints one
JSON line with the crawl wall time + throughput.
"""

from __future__ import annotations

import json
import os

if __name__ == "__main__":
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from bench import run_headline_crawl

    res = run_headline_crawl(num_cpus)
    ray.shutdown()
    print(json.dumps(res))
