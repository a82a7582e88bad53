"""Job registry: 409 mutual exclusion + job-id status (SURVEY §2.1 S3/S4)."""

import json
import os
import subprocess
import sys

import pytest

from licenta_crawler_ray.state.registry import (
    JobActiveError,
    JobActiveOnHost,
    JobRegistry,
    KVJobRegistry,
    LocalKVStore,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(params=["file", "kv"])
def registry(tmp_path, request):
    """Both backends run the SAME admission suite — the cluster-seam
    proof that swapping the fcntl file for a linearizable KV store (the
    COVERAGE.md second-node checklist item) changes only the transaction
    primitive, not the 409 semantics."""
    if request.param == "file":
        return JobRegistry(str(tmp_path / "reg.json"))
    return KVJobRegistry(LocalKVStore())


class TestRegistry:
    def test_host_exclusivity(self, registry, tmp_path):
        registry.acquire("job1", ["shop.example.com"], str(tmp_path / "w1"))
        with pytest.raises(JobActiveOnHost):
            registry.acquire("job2", ["shop.example.com", "other.com"],
                             str(tmp_path / "w2"))
        # disjoint hosts are admitted
        registry.acquire("job3", ["elsewhere.com"], str(tmp_path / "w3"))

    def test_workdir_exclusivity(self, registry, tmp_path):
        registry.acquire("job1", ["a.com"], str(tmp_path / "w"))
        with pytest.raises(JobActiveError):
            registry.acquire("job2", ["b.com"], str(tmp_path / "w"))

    def test_release_frees_host(self, registry, tmp_path):
        registry.acquire("job1", ["a.com"], str(tmp_path / "w1"))
        registry.release("job1")
        registry.acquire("job2", ["a.com"], str(tmp_path / "w2"))
        assert registry.get("job1")["status"] == "done"
        assert registry.get("job2")["active"]

    def test_dead_pid_reaped(self, registry, tmp_path):
        registry.acquire("job1", ["a.com"], str(tmp_path / "w1"))
        # forge a dead owner: rewrite the entry with an impossible pid
        def forge(data):
            data["job1"]["pid"] = 2**22 + 12345  # beyond pid_max on this box

        if isinstance(registry, JobRegistry):
            with open(registry.path) as f:
                data = json.load(f)
            forge(data)
            with open(registry.path, "w") as f:
                json.dump(data, f)
        else:
            registry.store.transact(lambda d: forge(d))
        registry.acquire("job2", ["a.com"], str(tmp_path / "w2"))  # no raise
        assert registry.get("job1")["status"] == "crashed"


class TestCli409:
    def test_second_crawl_on_same_host_409s(self, tiny_fixture, tmp_path):
        reg = JobRegistry(str(tmp_path / "reg.json"))
        # a live job (this test process) owns the fixture's hosts
        from licenta_crawler_ray.cli import _job_hosts

        reg.acquire("holder", _job_hosts(tiny_fixture), str(tmp_path / "w0"))
        r = subprocess.run(
            [sys.executable, "-m", "licenta_crawler_ray.cli", "crawl",
             "--fixture", tiny_fixture, "--workdir", str(tmp_path / "w1"),
             "--registry", reg.path, "--num-cpus", "2"],
            capture_output=True, text=True, cwd=REPO,
        )
        assert r.returncode == 1
        err = json.loads(r.stderr.strip().splitlines()[-1])
        assert err["http_equiv"] == 409
        assert "409" in err["error"]
        # admission must fail fast — before any Ray session starts
        assert "Started a local Ray instance" not in r.stderr

    def test_crawl_then_status_by_job_id(self, tiny_fixture, tmp_path):
        reg_path = str(tmp_path / "reg.json")
        wd = str(tmp_path / "job_wd")
        r = subprocess.run(
            [sys.executable, "-m", "licenta_crawler_ray.cli", "crawl",
             "--fixture", tiny_fixture, "--workdir", wd,
             "--registry", reg_path, "--job-id", "crawl-42", "--num-cpus", "4"],
            capture_output=True, text=True, cwd=REPO, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["job_id"] == "crawl-42"
        assert summary["visited_rows"] > 0
        assert summary["disallow_cookies"]  # per-job flag surfaced as metadata
        s = subprocess.run(
            [sys.executable, "-m", "licenta_crawler_ray.cli", "status",
             "--job-id", "crawl-42", "--registry", reg_path],
            capture_output=True, text=True, cwd=REPO,
        )
        assert s.returncode == 0, s.stderr[-2000:]
        st = json.loads(s.stdout.strip().splitlines()[-1])
        assert st["job"]["status"] == "done" and not st["job"]["active"]
        assert st["workdir"] == wd and st["committed"] > 0


def test_config_profiles(tmp_path):
    """Profile resolution: builtin defaults < config-file profile < explicit
    CLI values; unknown keys and names are 400-style errors."""
    import json

    import pytest

    from licenta_crawler_ray.config import load_profile, merge_settings

    # builtin
    p = load_profile("production")
    assert p["engine"] == "bucket" and p["enrich"] is True

    # config file shadows a builtin and defines its own default
    cfgp = tmp_path / "lcr.json"
    cfgp.write_text(json.dumps({
        "default_profile": "prod2",
        "profiles": {"prod2": {"engine": "pool", "host_budget": 32},
                     "production": {"host_budget": 1024}},
    }))
    assert load_profile(None, str(cfgp))["engine"] == "pool"
    shadowed = load_profile("production", str(cfgp))
    assert shadowed["host_budget"] == 1024 and shadowed["engine"] == "bucket"

    # CLI override precedence (None = not set on the command line)
    merged = merge_settings(load_profile("prod2", str(cfgp)),
                            {"engine": None, "host_budget": 7})
    assert merged["engine"] == "pool" and merged["host_budget"] == 7

    with pytest.raises(ValueError, match="unknown profile"):
        load_profile("nope")
    cfgp.write_text(json.dumps({"profiles": {"x": {"warp_speed": 9}}}))
    with pytest.raises(ValueError, match="unknown keys"):
        load_profile("x", str(cfgp))


def test_cli_crawl_with_profile(tmp_path, tiny_fixture):
    """The crawl CLI accepts --profile/--config and the run completes with
    profile-driven settings (debug profile → pool engine, small budget)."""
    import json

    from licenta_crawler_ray.cli import main

    wd = str(tmp_path / "cfg_job")
    reg = str(tmp_path / "reg.json")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["crawl", "--fixture", tiny_fixture, "--workdir", wd,
                   "--profile", "debug", "--num-cpus", "4",
                   "--registry", reg])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["visited_rows"] > 0
