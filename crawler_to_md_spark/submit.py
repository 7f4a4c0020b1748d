"""spark-submit --py-files launch path for the crawl engine.

The north-rule deployment shape is ``spark-submit --py-files`` on a
multi-executor cluster: the library ships to every executor as a zip, the
driver runs the same CLI surface as ``python -m crawler_to_md_spark.cli``
(reference entry point: crawler-to-md cli.py:20-299, single-process; here
the identical flag surface is submitted as a distributed Spark app).

Pieces:

- :func:`make_pyfiles_zip` — package ``crawler_to_md_spark`` source into a
  deterministic zip suitable for ``--py-files`` (pure-Python, no build
  step, so the same artifact works on yarn/k8s/standalone).
- :func:`write_job_shim` — the primary application file spark-submit
  needs; it only imports the CLI from the shipped zip and execs it, so
  every executor-visible line of code comes from ``--py-files``.
- :func:`submit_command` — the full argv.  Swap ``--master local[N]`` for
  ``yarn`` / ``k8s://...`` / ``spark://...`` and the command is the
  production launch; nothing else changes.
- ``python -m crawler_to_md_spark.submit [submit opts] -- [cli opts]`` —
  build the zip in a temp dir and exec spark-submit.

Sandbox note: tests run this end-to-end against ``--master local[2]`` and
``local-cluster[2,2,1024]`` is exercised by the bench harness; a real
cluster only changes the master URL.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import zipfile


def find_spark_submit() -> str:
    """Locate spark-submit: $SPARK_HOME, PATH, then the pyspark wheel."""
    home = os.environ.get("SPARK_HOME")
    if home:
        cand = os.path.join(home, "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    from shutil import which

    cand = which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError("spark-submit not found (SPARK_HOME, PATH, pyspark)")


def make_pyfiles_zip(dest_dir: str) -> str:
    """Zip the ``crawler_to_md_spark`` package sources for --py-files.

    Deterministic: fixed file order, fixed timestamps — the artifact hash
    is stable across builds, so cluster-side py-files caches stay warm.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "crawler_to_md_spark.zip")
    entries = []
    for root, dirs, files in os.walk(pkg_dir):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.join(
                    "crawler_to_md_spark", os.path.relpath(full, pkg_dir))
                entries.append((full, rel))
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return zip_path


_JOB_SHIM = """\
\"\"\"Primary application file for spark-submit; the real code arrives via
--py-files (crawler_to_md_spark.zip).\"\"\"
import sys

from crawler_to_md_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
"""


def write_job_shim(dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    path = os.path.join(dest_dir, "crawl_job.py")
    with open(path, "w", encoding="utf-8") as f:
        f.write(_JOB_SHIM)
    return path


def submit_command(
    cli_args: list[str],
    dest_dir: str,
    master: str = "local[2]",
    conf: dict[str, str] | None = None,
) -> list[str]:
    """Build the full ``spark-submit --py-files`` argv (does not run it)."""
    zip_path = make_pyfiles_zip(dest_dir)
    job_path = write_job_shim(dest_dir)
    cmd = [find_spark_submit(), "--master", master, "--py-files", zip_path]
    for k, v in (conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    cmd.append(job_path)
    cmd += cli_args
    return cmd


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    p = argparse.ArgumentParser(
        prog="python -m crawler_to_md_spark.submit",
        description="Launch the crawl CLI via spark-submit --py-files. "
        "Arguments after -- go to the crawl CLI.",
    )
    p.add_argument("--master", default="local[2]")
    p.add_argument("--conf", action="append", default=[],
                   help="k=v Spark conf, repeatable")
    if "--" in argv:
        split = argv.index("--")
        own, cli_args = argv[:split], argv[split + 1:]
    else:
        own, cli_args = argv, []
    args = p.parse_args(own)
    for kv in args.conf:
        if "=" not in kv:
            p.error(f"--conf expects k=v, got: {kv!r}")
    conf = dict(kv.split("=", 1) for kv in args.conf)
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    with tempfile.TemporaryDirectory(prefix="ctmds_submit_") as d:
        cmd = submit_command(cli_args, d, master=args.master, conf=conf)
        return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
