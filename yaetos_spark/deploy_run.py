"""Deploy execution — the run loop over the spec builders.

Behavior parity with the reference's deploy subsystem execute path
(reference: yaetos/deploy.py:98-120 ``run`` dispatch, :225-297
``tar_python_scripts``, :340-360 ``upload_temp_files``;
yaetos/deploy_emr.py:11-47 ``run_direct``, :50-75
``get_active_clusters``/``choose_cluster``): package the project as a
tar.gz, upload package + bootstrap material to S3, reuse an active
cluster or start a new one, submit the spark-submit step.

All AWS I/O goes through an injected boto3-SHAPED session object
(``session.client("emr")`` / ``session.client("s3")``) so the whole
loop runs offline against fakes in tests; pass nothing and it falls
back to real boto3 (import-gated — not present in this image).

One deliberate divergence: the reference's ``choose_cluster`` prompts
interactively (``input()``); a library can't block on stdin, so the
policy here is explicit ``cluster_id`` > ``reuse_cluster=True`` (first
active cluster with the framework name prefix) > create new.
"""

from __future__ import annotations

import os
import tarfile
import time

from yaetos_spark.deploy_cluster import (
    build_emr_cluster_spec,
    build_emr_spark_step,
    build_k8s_spark_submit,
)

ACTIVE_CLUSTER_STATES = ["STARTING", "BOOTSTRAPPING", "RUNNING", "WAITING"]
NAME_PREFIX = "yaetos_spark__"
# where the bootstrap extracts scripts.tar.gz on every node (reference:
# yaetos/etl_utils.py CLUSTER_APP_FOLDER = '/home/hadoop/app/')
CLUSTER_APP_DIR = "/home/hadoop/app"
# files never packaged by default: credentials travel via a secrets
# channel or an explicit ``extra_files`` opt-in, not inside the code
# tarball that lands in the (often broadly-readable) deploy/log bucket
SECRET_BASENAMES = ("connections.cfg",)


def pipeline_name(job_name: str, now_str: str) -> str:
    """Unique, reversible cluster/pipeline name (reference:
    deploy.py:186-199 generate_pipeline_name/get_job_name)."""
    return f"{NAME_PREFIX}{job_name.replace('.', '_d_').replace('/', '_s_')}__{now_str}"


def job_name_from_pipeline(name: str) -> str | None:
    if "__" not in name:
        return None
    return name.split("__")[1].replace("_d_", ".").replace("_s_", "/")


def package_project(
    project_dir: str,
    out_path: str,
    include_dirs: tuple[str, ...] = ("yaetos_spark", "jobs", "conf"),
    extensions: tuple[str, ...] = (".py", ".sql", ".yml", ".yaml"),
) -> str:
    """tar.gz the code that must travel to the cluster: engine package,
    project jobs, registry/conf (reference: deploy.py:225-297 — same
    role, walk-based instead of hardcoded subfolder list).

    ``.cfg`` files are deliberately NOT in the default extension list
    and ``connections.cfg`` is excluded unconditionally: the reference
    packages only code + registry and pushes secrets separately, and a
    credentials file inside scripts.tar.gz would otherwise be uploaded
    to the deploy bucket on every run. Ship credentials through a
    secrets channel or an explicit ``extra_files`` entry."""
    with tarfile.open(out_path, "w:gz") as tf:
        for sub in include_dirs:
            root = os.path.join(project_dir, sub)
            if not os.path.isdir(root):
                continue
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                for fn in sorted(filenames):
                    if fn in SECRET_BASENAMES:
                        continue
                    if not fn.endswith(extensions):
                        continue
                    full = os.path.join(dirpath, fn)
                    arcname = os.path.relpath(full, project_dir)
                    tf.add(full, arcname=arcname)
    return out_path


class DeployRunner:
    """The execute path. ``config`` keys: job_name, deploy ('EMR' |
    'k8s'), s3_bucket, s3_prefix ('pipelines_metadata'), project_dir,
    registry args for the spark step, plus the spec-builder kwargs
    (emr_version, instance groups, k8s_url/image...)."""

    def __init__(self, config: dict, session=None, now_str: str | None = None):
        self.config = dict(config)
        self.session = session if session is not None else _boto3_session()
        now_str = now_str or time.strftime("%Y%m%dT%H%M%S", time.gmtime())
        self.pipeline_name = pipeline_name(config["job_name"], now_str)
        self.package_path = f"{config.get('s3_prefix', 'pipelines_metadata')}/{self.pipeline_name}"
        self.cluster_id: str | None = None
        self.step_ids: list[str] = []

    # -- dispatch (reference: deploy.py:98-120 run) --
    def run(self):
        deploy = self.config.get("deploy", "EMR")
        if deploy == "EMR":
            return self.run_direct()
        if deploy == "k8s":
            return self.run_direct_k8s()
        raise ValueError(f"unknown deploy target '{deploy}'")

    # -- EMR path (reference: deploy_emr.py:11-47 run_direct) --
    def run_direct(self) -> tuple[str, list[str]]:
        self.s3_ops()
        emr = self.session.client("emr")
        chosen = self.choose_cluster(self.get_active_clusters(emr))
        if chosen is None:
            spec = build_emr_cluster_spec(
                pipeline_name=self.pipeline_name,
                s3_logs=f"s3://{self.config['s3_bucket']}/{self.package_path}/manual_run_logs/",
                package_path=f"s3://{self.config['s3_bucket']}/{self.package_path}",
                emr_version=self.config.get("emr_version", "emr-7.2.0"),
                instance_groups=self.config.get("instance_groups"),
                ec2_key_name=self.config.get("ec2_key_name"),
                ec2_subnet_id=self.config.get("ec2_subnet_id"),
                leave_on=bool(self.config.get("leave_on", False)),
            )
            self.cluster_id = emr.run_job_flow(**spec)["JobFlowId"]
        else:
            self.cluster_id = chosen
        # the bootstrap extracted scripts.tar.gz into CLUSTER_APP_DIR on
        # every node, so the step's primary resource is the extracted
        # cli script and the zipped package rides --py-files (reference:
        # CLUSTER_APP_FOLDER-prefixed app_file + scripts.zip py-files)
        step = build_emr_spark_step(
            self.config.get("job_args", {"job_name": self.config["job_name"]}),
            name=f"Spark Application - {self.pipeline_name}",
            entry=f"{CLUSTER_APP_DIR}/yaetos_spark/cli.py",
            py_files=f"{CLUSTER_APP_DIR}/scripts.zip",
        )
        resp = emr.add_job_flow_steps(JobFlowId=self.cluster_id, Steps=[step])
        self.step_ids = list(resp.get("StepIds", []))
        return self.cluster_id, self.step_ids

    def get_active_clusters(self, emr) -> list[tuple[str, str]]:
        """(id, name) of reusable clusters (reference:
        deploy_emr.py:50-56)."""
        resp = emr.list_clusters(ClusterStates=ACTIVE_CLUSTER_STATES)
        return [(c["Id"], c["Name"]) for c in resp.get("Clusters", [])]

    def choose_cluster(self, clusters: list[tuple[str, str]]) -> str | None:
        """Non-interactive replacement for the reference's stdin prompt
        (deploy_emr.py:58-75): explicit id wins, then opt-in reuse of
        the first framework-named active cluster, else None → create."""
        if self.config.get("cluster_id"):
            return self.config["cluster_id"]
        if self.config.get("reuse_cluster"):
            for cid, name in clusters:
                if name.startswith(NAME_PREFIX):
                    return cid
        return None

    # -- S3 ops (reference: deploy.py:200-223, 340-360) --
    def s3_ops(self) -> list[str]:
        s3 = self.session.client("s3")
        bucket = self.config["s3_bucket"]
        try:
            s3.head_bucket(Bucket=bucket)
        except Exception as exc:
            raise ValueError(
                f"S3 bucket for deploy artifacts does not exist or is "
                f"unreachable: '{bucket}'"
            ) from exc
        tmp = self.config.get("tmp_dir") or os.path.join(
            self.config.get("project_dir", "."), ".deploy_tmp"
        )
        os.makedirs(tmp, exist_ok=True)
        tar_path = package_project(
            self.config.get("project_dir", "."), os.path.join(tmp, "scripts.tar.gz")
        )
        uploads = {"scripts.tar.gz": tar_path}
        for extra in self.config.get("extra_files", []):
            uploads[os.path.basename(extra)] = extra
        keys = []
        for name, path in uploads.items():
            key = f"{self.package_path}/{name}"
            with open(path, "rb") as f:
                s3.put_object(Bucket=bucket, Key=key, Body=f.read())
            keys.append(key)
        # bootstrap scripts the cluster spec points at (generated, not
        # copied: the image ships no shell assets)
        package_s3 = f"s3://{bucket}/{self.package_path}"
        boot_key = f"{self.package_path}/setup_nodes.sh"
        s3.put_object(
            Bucket=bucket,
            Key=boot_key,
            Body=_bootstrap_script(self.config, package_s3).encode(),
        )
        keys.append(boot_key)
        idle_min = self.config.get("terminate_idle_after_min")
        if idle_min:
            # cost-control watchdog (role parity with the reference's
            # terminate_idle_cluster.sh upload, deploy.py:357-358): the
            # master self-terminates after N idle minutes
            idle_key = f"{self.package_path}/terminate_idle_cluster.sh"
            s3.put_object(
                Bucket=bucket,
                Key=idle_key,
                Body=_idle_termination_script(int(idle_min)).encode(),
            )
            keys.append(idle_key)
        return keys

    # -- k8s path (reference: deploy_k8s.py:27-60 + launch) --
    def run_direct_k8s(self):
        argv = build_k8s_spark_submit(
            self.config.get("job_args", {"job_name": self.config["job_name"]}),
            k8s_url=self.config["k8s_url"],
            image=self.config["k8s_image"],
            namespace=self.config.get("k8s_namespace", "default"),
            app_name=self.pipeline_name.lower().replace("_", "-"),
            executor_instances=int(self.config.get("executor_instances", 2)),
            upload_path=self.config.get("k8s_upload_path"),
        )
        runner = self.config.get("submit_runner") or _subprocess_runner
        return runner(argv)


def _bootstrap_script(config: dict, package_s3: str) -> str:
    """Node bootstrap: install deps, then fetch + extract the uploaded
    package so the spark step's ``CLUSTER_APP_DIR`` entry path exists
    (reference: scripts/setup_master.sh — ``aws s3 cp`` scripts.tar.gz,
    untar into /home/hadoop/app, zip for --py-files, and launch the
    idle-termination watchdog on the master when configured)."""
    reqs = " ".join(config.get("pip_requirements", ["pyspark", "pyarrow", "pandas"]))
    lines = [
        "#!/bin/bash",
        "set -euo pipefail",
        f"sudo python3 -m pip install {reqs}",
        f"aws s3 cp {package_s3}/scripts.tar.gz /home/hadoop/scripts.tar.gz",
        f"mkdir -p {CLUSTER_APP_DIR}",
        f"tar -xzf /home/hadoop/scripts.tar.gz -C {CLUSTER_APP_DIR}",
        # zip the extracted tree for --py-files (stdlib zipfile: the
        # AMI may not ship /usr/bin/zip)
        f"(cd {CLUSTER_APP_DIR} && python3 -m zipfile -c scripts.zip"
        " yaetos_spark jobs conf 2>/dev/null"
        f" || python3 -m zipfile -c scripts.zip yaetos_spark)",
    ]
    if config.get("terminate_idle_after_min"):
        # master-only (instance.json is the documented EMR marker):
        # fetch and background the watchdog so configured clusters
        # actually self-terminate
        lines += [
            "if grep -q '\"isMaster\": true' /mnt/var/lib/info/instance.json; then",
            f"  aws s3 cp {package_s3}/terminate_idle_cluster.sh"
            " /home/hadoop/terminate_idle_cluster.sh",
            "  chmod +x /home/hadoop/terminate_idle_cluster.sh",
            "  nohup /home/hadoop/terminate_idle_cluster.sh"
            " >/home/hadoop/terminate_idle_cluster.log 2>&1 &",
            "fi",
        ]
    return "\n".join(lines) + "\n"


def _idle_termination_script(idle_minutes: int) -> str:
    """Self-termination watchdog run on the master via bootstrap: polls
    the YARN ResourceManager for running applications and shuts the
    instance down after ``idle_minutes`` without any (authored fresh —
    same role as the mrjob-derived script the reference ships)."""
    return (
        "#!/bin/bash\n"
        "set -u\n"
        f"IDLE_LIMIT_SEC={idle_minutes * 60}\n"
        "IDLE_SINCE=$(date +%s)\n"
        "while true; do\n"
        "  sleep 60\n"
        "  RUNNING=$(yarn application -list -appStates RUNNING 2>/dev/null"
        " | grep -c application_ || true)\n"
        "  NOW=$(date +%s)\n"
        "  if [ \"$RUNNING\" -gt 0 ]; then IDLE_SINCE=$NOW; fi\n"
        "  if [ $((NOW - IDLE_SINCE)) -ge $IDLE_LIMIT_SEC ]; then\n"
        "    sudo shutdown -h now\n"
        "  fi\n"
        "done\n"
    )


def _subprocess_runner(argv: list[str]) -> int:
    import subprocess

    return subprocess.run(argv, check=True).returncode


def _boto3_session():
    try:
        import boto3
    except ImportError as exc:  # not in this image — inject a fake in tests
        raise NotImplementedError("live deploy requires boto3; pass session=") from exc
    return boto3.Session()


__all__ = [
    "DeployRunner",
    "package_project",
    "pipeline_name",
    "job_name_from_pipeline",
]
