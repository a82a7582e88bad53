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


def _default_registry(workdir: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(workdir)), "lcr_jobs.json")


def _job_hosts(fixture_dir: str) -> list[str]:
    from .functions.urls import host_of_url
    from .oracle import load_jobs

    return sorted({host_of_url(j["homepage"]) for j in load_jobs(fixture_dir)})


def cmd_crawl(args: argparse.Namespace) -> int:
    from .config import load_profile, merge_settings
    from .state.registry import JobActiveError, JobRegistry

    # admission (409 + 400 equivalents) runs BEFORE any Ray startup, like the
    # reference resource validates before launching a crawler thread; the
    # profile resolves first so a bad --profile/--config is a 400, not a
    # half-started job
    job_id = args.job_id or os.path.basename(os.path.abspath(args.workdir))
    registry = JobRegistry(args.registry or _default_registry(args.workdir))
    try:
        cfg = merge_settings(
            load_profile(args.profile, args.config),
            {
                "engine": args.engine,
                "host_budget": args.host_budget,
                "num_cpus": args.num_cpus,
                "enrich": True if args.enrich else None,
                "fetch_leaves": False if args.no_fetch_leaves else None,
            },
        )
        jobs_path = os.path.join(args.fixture, "jobs.json")
        with open(jobs_path) as f:
            job_specs = json.load(f)
        registry.acquire(job_id, _job_hosts(args.fixture), args.workdir)
    except (OSError, ValueError) as e:  # JobActiveError is a ValueError
        code = 409 if isinstance(e, JobActiveError) else 400
        print(json.dumps({"error": str(e), "http_equiv": code}), file=sys.stderr)
        return 1

    num_cpus = int(cfg.get("num_cpus") or os.environ.get("RAY_GRAFT_CPUS", "32"))
    if cfg.get("fetch_cache_bytes") is not None:
        # documented per-actor cache seam; exported before ray.init so the
        # worker processes inherit it
        os.environ["LCR_FETCH_CACHE_BYTES"] = str(int(cfg["fetch_cache_bytes"]))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
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
            fetch_leaves=cfg.get("fetch_leaves", True),
            host_budget=cfg.get("host_budget", 256),
            fetch_concurrency=max(2, (num_cpus * 3) // 4),
            engine=cfg.get("engine", "bucket"),
            enrich=bool(cfg.get("enrich", False)),
        )
        summary = pipe.run(resume=args.resume)
    except ValueError as e:  # job admission failure → HTTP-400 equivalent
        registry.release(job_id, status="failed")
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 1
    finally:
        pipe = locals().get("pipe")
        if pipe is not None:
            pipe.close()
        ray.shutdown()
    registry.release(job_id, status="done")
    summary["job_id"] = job_id
    # disallowCookies is parsed per the job-spec schema
    # (CrawlJobResource.java:62-67); the reference feeds it to browser prefs
    # (BrowserCrawler.java:86). The parquet probe has no cookie state, so the
    # flag is surfaced as job metadata rather than altering fetch behavior.
    summary["disallow_cookies"] = {
        j["homepage"]: bool(j.get("disallowCookies", False)) for j in job_specs
    }
    print(json.dumps(summary))
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    """Committed lineage of a job (GET /jobs / GET /jobs/{id} analogue).

    ``--job-id`` resolves the workdir through the registry
    (``CrawlJobResource.java:46-51``); ``--workdir`` reads one directly.
    """
    entry = None
    wd = args.workdir
    if args.job_id:
        from .state.registry import JobRegistry

        if not args.registry and not wd:
            print(json.dumps({"error": "--job-id needs --registry (or --workdir)"}),
                  file=sys.stderr)
            return 1
        reg_path = args.registry or _default_registry(wd)
        entry = JobRegistry(reg_path).get(args.job_id)
        if entry is None:
            print(json.dumps({"error": f"no such job: {args.job_id}"}), file=sys.stderr)
            return 1  # 404 equivalent
        wd = entry["workdir"]
    if not wd or not os.path.isdir(wd):
        print(json.dumps({"error": f"no such workdir: {wd}"}), file=sys.stderr)
        return 1
    out = []
    for d in sorted(os.listdir(wd)):
        lp = os.path.join(wd, d, "lineage.json")
        if d.endswith(".tmp") or not os.path.exists(lp):
            continue
        with open(lp) as f:
            row = json.load(f)
        row.pop("lineage", None)
        out.append({"partition": d, **row})
    res = {"workdir": wd, "committed": len(out), "partitions": out}
    if entry is not None:
        res["job"] = {"job_id": args.job_id, "status": entry["status"],
                      "active": entry["active"], "hosts": entry["hosts"]}
    print(json.dumps(res))
    return 0


def cmd_ingest(args: argparse.Namespace) -> int:
    """Archive → corpus ingest (``ray job submit``-able): WARC-lite or real
    WARC/1.0 segments into the engine's hive ``host_bucket={b}/`` layout,
    worker-side and resumable per bucket (see ``sources/warc_lite.py``)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from .sources.warc_lite import ingest_warc_lite

    try:
        summary = ingest_warc_lite(
            args.warc_dir, args.pages_dir,
            num_buckets=args.num_buckets, resume=not args.no_resume,
        )
    except (OSError, ValueError) as e:
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 1
    finally:
        ray.shutdown()
    print(json.dumps(summary))
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
    c.add_argument("--engine", default=None,
                   choices=["bucket", "pool", "ray_data", "ray_data_distributed"],
                   help="default: profile value, else bucket")
    c.add_argument("--host-budget", type=int, default=None)
    c.add_argument("--num-cpus", type=int, default=None,
                   help="default: profile value, else $RAY_GRAFT_CPUS or 32")
    c.add_argument("--no-fetch-leaves", action="store_true")
    c.add_argument("--enrich", action="store_true")
    c.add_argument("--profile", default=None,
                   help="named settings profile (builtin: local|debug|production, "
                        "or from --config) — the reference's Maven-profile surface")
    c.add_argument("--config", default=None,
                   help="JSON config file with {profiles: {...}, default_profile}")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--job-id", default=None,
                   help="job identifier for the registry (default: workdir basename)")
    c.add_argument("--registry", default=None,
                   help="registry JSON path (default: <workdir parent>/lcr_jobs.json)")
    c.set_defaults(fn=cmd_crawl)

    st = sub.add_parser("status", help="committed checkpoint lineage (GET /jobs[/id] analogue)")
    st.add_argument("--workdir", default=None)
    st.add_argument("--job-id", default=None)
    st.add_argument("--registry", default=None)
    st.set_defaults(fn=cmd_status)

    ing = sub.add_parser("ingest", help="WARC(-lite) archives → hive pages corpus")
    ing.add_argument("--warc-dir", required=True)
    ing.add_argument("--pages-dir", required=True)
    ing.add_argument("--num-buckets", type=int, default=16)
    ing.add_argument("--num-cpus", type=int, default=None)
    ing.add_argument("--no-resume", action="store_true",
                     help="rewrite committed bucket partitions instead of skipping")
    ing.set_defaults(fn=cmd_ingest)

    g = sub.add_parser("gen", help="generate a synthetic CC-style corpus")
    g.add_argument("scale", choices=["tiny", "small", "bench"])
    g.add_argument("out")
    g.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
