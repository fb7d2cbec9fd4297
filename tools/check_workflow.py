"""Static validator for the repo's GitHub Actions workflows.

The e2e workflow (.github/workflows/e2e.yml) cannot execute in this
sandbox (no Docker), so a YAML typo or a broken run-block would only
surface on the first real CI run. This tool catches the statically
checkable failure classes in-tree (r6 verdict item 4):

- YAML parses; required GitHub Actions structure present
  (name / on / jobs; per job: runs-on + steps; per step: run XOR uses);
- every ``run`` block is valid bash (``bash -n`` after replacing
  ``${{ ... }}`` expressions with a placeholder);
- every repo path a run block references (tools/*.py, tests/*.py,
  examples/*) exists in the tree;
- service definitions carry an image;
- the pyspark version pinned in install steps matches the
  spark-sql-kafka artifact version in PYSPARK_SUBMIT_ARGS (a mismatch
  is a guaranteed classpath failure at session start).

Usage: python tools/check_workflow.py [workflow.yml ...]
Default: every file under .github/workflows/. Exit 0 = all pass.
"""

from __future__ import annotations

import re
import subprocess
import sys
import tempfile
from pathlib import Path

import yaml

_REPO = Path(__file__).resolve().parent.parent


def _err(errors: list[str], path: Path, msg: str) -> None:
    errors.append(f"{path.name}: {msg}")


def _strip_expressions(script: str) -> str:
    """Replace ${{ ... }} GitHub expressions with a bash-neutral token."""
    return re.sub(r"\$\{\{.*?\}\}", "GH_EXPR", script, flags=re.S)


def _bash_syntax_ok(script: str) -> str | None:
    with tempfile.NamedTemporaryFile("w", suffix=".sh", delete=False) as f:
        f.write(_strip_expressions(script))
        name = f.name
    try:
        out = subprocess.run(
            ["bash", "-n", name], capture_output=True, text=True
        )
        return None if out.returncode == 0 else out.stderr.strip()
    finally:
        Path(name).unlink(missing_ok=True)


_PATH_RE = re.compile(r"(?<![\w/.-])((?:tools|tests|examples)/[\w./-]+\.\w+)")


def check_workflow(path: Path) -> list[str]:
    errors: list[str] = []
    try:
        doc = yaml.safe_load(path.read_text())
    except yaml.YAMLError as e:
        return [f"{path.name}: YAML parse error: {e}"]
    if not isinstance(doc, dict):
        return [f"{path.name}: not a mapping"]

    # PyYAML parses the bare key `on:` as boolean True (YAML 1.1)
    if "on" not in doc and True not in doc:
        _err(errors, path, "missing trigger block (on:)")
    jobs = doc.get("jobs")
    if not isinstance(jobs, dict) or not jobs:
        return errors + [f"{path.name}: missing/empty jobs"]

    # (pin, artifact) are tracked PER JOB: a last-write-wins file-global
    # pair would compare one job's pyspark pin against another job's
    # kafka artifact and mask a genuine mismatch in an earlier job.
    for job_name, job in jobs.items():
        pyspark_pin = None
        kafka_artifact = None
        if not isinstance(job, dict):
            _err(errors, path, f"job {job_name}: not a mapping")
            continue
        if "runs-on" not in job:
            _err(errors, path, f"job {job_name}: missing runs-on")
        steps = job.get("steps")
        if not isinstance(steps, list) or not steps:
            _err(errors, path, f"job {job_name}: missing/empty steps")
            continue
        for svc_name, svc in (job.get("services") or {}).items():
            if not isinstance(svc, dict) or "image" not in svc:
                _err(errors, path, f"job {job_name}: service {svc_name} has no image")
        env_blobs = [str(v) for v in (job.get("env") or {}).values()] + [
            str(v) for v in (doc.get("env") or {}).values()
        ]
        for blob in env_blobs:
            m = re.search(r"spark-sql-kafka-[\d.-]+_[\d.]+:([\d.]+)", blob)
            if m:
                kafka_artifact = m.group(1)
        for i, step in enumerate(steps):
            if not isinstance(step, dict):
                _err(errors, path, f"job {job_name} step {i}: not a mapping")
                continue
            has_run, has_uses = "run" in step, "uses" in step
            if has_run == has_uses:
                _err(
                    errors, path,
                    f"job {job_name} step {i} "
                    f"({step.get('name', '?')}): needs exactly one of run/uses",
                )
            if has_run:
                script = str(step["run"])
                bad = _bash_syntax_ok(script)
                if bad:
                    _err(
                        errors, path,
                        f"job {job_name} step {i} "
                        f"({step.get('name', '?')}): bash syntax: {bad}",
                    )
                m = re.search(r'pyspark==([\d.]+)', script)
                if m:
                    pyspark_pin = m.group(1)
                for ref in _PATH_RE.findall(_strip_expressions(script)):
                    if not (_REPO / ref).exists():
                        _err(
                            errors, path,
                            f"job {job_name} step {i}: references missing "
                            f"repo path {ref}",
                        )
        if pyspark_pin and kafka_artifact and pyspark_pin != kafka_artifact:
            _err(
                errors, path,
                f"job {job_name}: pyspark pin {pyspark_pin} != "
                f"spark-sql-kafka artifact version {kafka_artifact} "
                f"(classpath mismatch at session start)",
            )
    return errors


def main(argv: list[str]) -> int:
    targets = [Path(a) for a in argv] or sorted(
        (_REPO / ".github" / "workflows").glob("*.yml")
    )
    all_errors: list[str] = []
    for t in targets:
        errs = check_workflow(t)
        print(f"{'FAIL' if errs else 'PASS'} {t}")
        all_errors += errs
    for e in all_errors:
        print(f"  {e}", file=sys.stderr)
    return 1 if all_errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
