"""CLI entry point — the rebuild's job-submission surface (SURVEY §2.1 S3/S4).

Replaces the reference's Jersey REST resource (``CrawlJobResource.java``):
- ``crawl``  ≙ ``POST /jobs`` — validates the job-spec JSON
  (``{homepage, seeds[], additionalSitemaps[], disallowCookies}``,
  schema per ``CrawlJobResource.java:57-67``), then runs the engine.
  Invalid specs exit 1 with the 400-style reason; submission is
  ``ray job submit python -m licenta_crawler_ray.cli crawl ...``-able.
- ``status`` ≙ ``GET /jobs`` / ``GET /jobs/{id}`` — reads the committed
  checkpoint lineage of a workdir.

This module OWNS its Ray session (guarded init; the library never inits).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def cmd_crawl(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from .pipelines.crawl import CrawlPipeline

    try:
        pipe = CrawlPipeline(
            args.fixture,
            args.workdir,
            fetch_leaves=not args.no_fetch_leaves,
            host_budget=args.host_budget,
            fetch_concurrency=max(2, (args.num_cpus * 3) // 4),
            engine=args.engine,
            enrich=args.enrich,
        )
        summary = pipe.run(resume=args.resume)
    except ValueError as e:  # job admission failure → HTTP-400 equivalent
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 1
    finally:
        pipe = locals().get("pipe")
        if pipe is not None:
            pipe.close()
        ray.shutdown()
    print(json.dumps(summary))
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    """Committed lineage of a job workdir (GET /jobs analogue)."""
    out = []
    wd = args.workdir
    if not os.path.isdir(wd):
        print(json.dumps({"error": f"no such workdir: {wd}"}), file=sys.stderr)
        return 1
    for d in sorted(os.listdir(wd)):
        lp = os.path.join(wd, d, "lineage.json")
        if d.endswith(".tmp") or not os.path.exists(lp):
            continue
        with open(lp) as f:
            row = json.load(f)
        row.pop("lineage", None)
        out.append({"partition": d, **row})
    print(json.dumps({"workdir": wd, "committed": len(out), "partitions": out}))
    return 0


def cmd_gen(args: argparse.Namespace) -> int:
    from .fixtures.gen import BENCH, SMALL, TINY, generate

    params = {"tiny": TINY, "small": SMALL, "bench": BENCH}[args.scale]
    print(json.dumps(generate(args.out, **params)))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="licenta_crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a crawl over a fixture corpus (POST /jobs analogue)")
    c.add_argument("--fixture", required=True, help="fixture dir (pages/ + jobs.json + robots.json)")
    c.add_argument("--workdir", required=True, help="checkpoint/output dir")
    c.add_argument("--engine", default="bucket",
                   choices=["bucket", "pool", "ray_data", "ray_data_distributed"])
    c.add_argument("--host-budget", type=int, default=256)
    c.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    c.add_argument("--no-fetch-leaves", action="store_true")
    c.add_argument("--enrich", action="store_true")
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    st = sub.add_parser("status", help="committed checkpoint lineage (GET /jobs analogue)")
    st.add_argument("--workdir", required=True)
    st.set_defaults(fn=cmd_status)

    g = sub.add_parser("gen", help="generate a synthetic CC-style corpus")
    g.add_argument("scale", choices=["tiny", "small", "bench"])
    g.add_argument("out")
    g.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
