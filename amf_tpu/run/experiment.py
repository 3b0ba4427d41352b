"""Experiment harness: named configurations reproducing the reference's
results/*/Makefile workloads (SURVEY.md §6), driven as one CLI.

The reference runs experiments through per-directory Makefiles
(Makefile-template:1-113) with data-prep + per-model-result targets, git-rev
provenance stamping (get_git_rev.sh), and skip-if-exists semantics. This CLI
reproduces that: `--list` shows the catalog; running an experiment prepares
data (cached), runs the requested model CLIs, and stamps provenance notes.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from typing import Dict, List, NamedTuple, Optional


class Experiment(NamedTuple):
    name: str
    source: str  # reference Makefile this reproduces
    data_cmd: List[str]  # argv for the data-prep CLI (module, *args)
    runs: Dict[str, List[str]]  # result-kind -> argv for the model CLI


def _ml100k_path() -> Optional[str]:
    from amf_tpu.data.loaders import find_reference_dataset

    return find_reference_dataset("movielens-100k")


def _drugbank_path() -> Optional[str]:
    root = os.environ.get("AMF_REFERENCE_ROOT", "/root/reference")
    path = os.path.join(root, "drugbank", "subset_94x425.npy")
    return path if os.path.exists(path) else None


def catalog() -> Dict[str, Experiment]:
    """The reference workload table (BASELINE.md)."""
    exps: Dict[str, Experiment] = {}

    # 10x10 rank-2 discrete (results/10x10_discrete2_d2/Makefile:46-51).
    # NOTE: the literal reference counts (known-pos 10 / unknown-pos 90 at
    # cutoff 4) are infeasible for rejection sampling; these match the
    # documented mechanism with attainable counts.
    exps["10x10_discrete2_d2"] = Experiment(
        name="10x10_discrete2_d2",
        source="results/10x10_discrete2_d2/Makefile",
        data_cmd=[
            "amf_tpu.run.generate", "--rows", "10", "--cols", "10",
            "--rank", "2", "--known-pos", "4", "--unknown-pos", "36",
            "{data}",
        ],
        runs={
            "apmf": [
                "amf_tpu.run.active_pmf", "--load-data", "{data}",
                "--latent-d", "2", "--discrete-integration",
                "--refit-lookahead",
                "--save-results", "{out}/results_apmf.pkl", "--no-verbose",
                "random", "pred-variance", "total-variance", "uv-entropy",
            ],
            "stan": [
                "amf_tpu.run.bpmf", "--load-data", "{data}",
                "--latent-d", "2", "--samps", "200", "--warmup", "200",
                "--save-results", "{out}/results_stan.pkl", "--no-verbose",
                "random", "pred-variance", "pred", "prob-ge-3.5",
            ],
            "bayes": [
                "amf_tpu.run.bayes_pmf", "--load-data", "{data}",
                "--latent-d", "2", "--samps", "128",
                "--save-results", "{out}/results_bayes.pkl", "--no-verbose",
                "random", "pred-variance", "pred",
            ],
            "rc": [
                "amf_tpu.run.active_rc", "--load-data", "{data}",
                "--save-results", "{out}/results_rc.pkl", "--no-verbose",
                "random", "ge-4",
            ],
            "mmmf": [
                "amf_tpu.run.active_mmmf", "--load-data", "{data}",
                "--cutoff", "3.5", "-C", "1",
                "--save-results", "{out}/results_mmmf.pkl", "--no-verbose",
                "random", "min-margin",
            ],
        },
    )

    ml = _ml100k_path()
    if ml:
        # results/movielens-100k-from5%-test5%/Makefile:32-58
        exps["movielens-100k-from5pct-test5pct"] = Experiment(
            name="movielens-100k-from5pct-test5pct",
            source="results/movielens-100k-from5%-test5%/Makefile",
            data_cmd=[
                "amf_tpu.run.choose_training", ml, "{data}",
                "--pick-known-frac", "0.05", "--test-known-frac", "0.05",
            ],
            runs={
                "stan": [
                    "amf_tpu.run.bpmf", "--load-data", "{data}",
                    "--latent-d", "20", "--samps", "200", "--warmup", "100",
                    "--steps", "200", "--float32",
                    "--save-results", "{out}/results_stan.pkl", "--no-verbose",
                    "random", "pred-variance", "pred", "prob-ge-3.5",
                ],
                "bayes": [
                    "amf_tpu.run.bayes_pmf", "--load-data", "{data}",
                    "--latent-d", "20", "--samps", "128", "--steps", "200",
                    "--float32",
                    "--save-results", "{out}/results_bayes.pkl", "--no-verbose",
                    "random", "pred-variance",
                ],
            },
        )

    db = _drugbank_path()
    if db:
        # results/drugbank-94x425/Makefile:32,41-66: 500 drugbank-picked seeds,
        # 2000 equal-class test cells, binary accuracy, d=20, 150 steps, C=1
        exps["drugbank-94x425"] = Experiment(
            name="drugbank-94x425",
            source="results/drugbank-94x425/Makefile",
            data_cmd=[
                "amf_tpu.run.choose_training", db, "{data}",
                "--drugbank", "--n-pick", "500",
                "--test-equal-classes", "--n-test", "2000",
            ],
            runs={
                "mmmf": [
                    "amf_tpu.run.active_mmmf", "--load-data", "{data}",
                    "-C", "1", "--steps", "150",
                    "--save-results", "{out}/results_mmmf.pkl", "--no-verbose",
                    "random", "min-margin", "min-margin-pos",
                ],
                "stan": [
                    "amf_tpu.run.bpmf", "--load-data", "{data}",
                    "--latent-d", "20", "--samps", "200", "--warmup", "100",
                    "--steps", "150", "--float32",
                    "--save-results", "{out}/results_stan.pkl", "--no-verbose",
                    "random", "pred-variance", "prob-ge-0",
                ],
            },
        )

    # criteria-agreement micro-workload (results/criteria/.../Makefile:36-96)
    exps["criteria_10x10_r1"] = Experiment(
        name="criteria_10x10_r1",
        source="results/criteria/10x10_r1_u10_v10_1/Makefile",
        data_cmd=[
            "amf_tpu.run.generate", "--rows", "10", "--cols", "10",
            "--rank", "1", "--known-pos", "4", "--unknown-pos", "36",
            "{data}",
        ],
        runs={
            "apmf": [
                "amf_tpu.run.active_pmf", "--load-data", "{data}",
                "--latent-d", "1", "--discrete-integration", "--steps", "2",
                "--save-results", "{out}/results_apmf.pkl", "--no-verbose",
                "pred-variance", "total-variance",
            ],
            "stan": [
                "amf_tpu.run.bpmf", "--load-data", "{data}",
                "--latent-d", "1", "--samps", "100", "--steps", "2",
                "--save-results", "{out}/results_stan.pkl", "--no-verbose",
                "pred-variance",
            ],
        },
    )
    return exps


def _git_rev() -> str:
    """Provenance stamp (reference: get_git_rev.sh:7-31)."""
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True,
        ).stdout.strip()
        return rev + ("-dirty" if dirty else "")
    except Exception:
        return "unknown"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("experiment", nargs="?", default=None)
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--outdir", default="experiments")
    parser.add_argument("--only", nargs="*", default=None,
                        help="run only these result kinds")
    parser.add_argument("--force", action="store_true",
                        help="rerun even if the result file exists")
    args = parser.parse_args(argv)

    exps = catalog()
    if args.list or not args.experiment:
        print(f"{'experiment':<40} reproduces")
        for name, e in exps.items():
            print(f"{name:<40} {e.source}")
        return
    if args.experiment not in exps:
        sys.stderr.write(f"unknown experiment {args.experiment}\n")
        sys.exit(1)

    exp = exps[args.experiment]
    out = os.path.join(args.outdir, exp.name)
    os.makedirs(out, exist_ok=True)
    # choose_training saves via np.savez_compressed, which appends .npz to
    # any other suffix — name the file accordingly or it is never found
    suffix = ".npz" if "choose_training" in exp.data_cmd[0] else ".pkl"
    data = os.path.join(out, "data" + suffix)
    rev = _git_rev()

    def fill(tokens):
        return [t.format(data=data, out=out) for t in tokens]

    if not os.path.exists(data):
        cmd = fill(exp.data_cmd)
        print("preparing data:", " ".join(cmd))
        mod, *rest = cmd
        subprocess.run([sys.executable, "-m", mod, *rest], check=True)
    else:
        print(f"data exists: {data} (skipping prep)")

    for kind, run_cmd in exp.runs.items():
        if args.only and kind not in args.only:
            continue
        cmd = fill(run_cmd)
        result_path = next(
            (c for c in cmd if c.endswith(".pkl") and "results" in c), None
        )
        if result_path and os.path.exists(result_path) and not args.force:
            print(f"[{kind}] exists: {result_path} (skipping; --force to rerun)")
            continue
        cmd = cmd + ["--note", f"git-rev:{rev}", "--note", f"experiment:{exp.name}"]
        print(f"[{kind}] running:", " ".join(cmd))
        mod, *rest = cmd
        proc = subprocess.run([sys.executable, "-m", mod, *rest])
        if proc.returncode != 0:
            sys.stderr.write(f"[{kind}] FAILED (exit {proc.returncode})\n")
            sys.exit(proc.returncode)

    print(f"\nexperiment {exp.name} complete; results under {out}/")


if __name__ == "__main__":
    main()
