"""Deploy execute-path tests — the full run loop against boto3-shaped
fakes (no network, no boto3). Mirrors the reference's
deploy_emr.run_direct flow: package → upload → cluster choose/create →
step submit."""

import os
import tarfile

import pytest

from yaetos_spark.deploy_run import (
    DeployRunner,
    job_name_from_pipeline,
    package_project,
    pipeline_name,
)


class FakeS3:
    def __init__(self, buckets=("my-bucket",)):
        self.buckets = set(buckets)
        self.objects = {}

    def head_bucket(self, Bucket):
        if Bucket not in self.buckets:
            raise RuntimeError("404")
        return {}

    def put_object(self, Bucket, Key, Body):
        self.objects[(Bucket, Key)] = Body


class FakeEMR:
    def __init__(self, clusters=()):
        self.clusters = list(clusters)
        self.run_job_flow_calls = []
        self.step_calls = []

    def list_clusters(self, ClusterStates):
        return {"Clusters": [{"Id": i, "Name": n} for i, n in self.clusters]}

    def run_job_flow(self, **spec):
        self.run_job_flow_calls.append(spec)
        return {"JobFlowId": "j-NEW"}

    def add_job_flow_steps(self, JobFlowId, Steps):
        self.step_calls.append((JobFlowId, Steps))
        return {"StepIds": [f"s-{i}" for i in range(len(Steps))]}


class FakeSession:
    def __init__(self, s3=None, emr=None):
        self._clients = {"s3": s3 or FakeS3(), "emr": emr or FakeEMR()}

    def client(self, name):
        return self._clients[name]


@pytest.fixture()
def project(tmp_path):
    (tmp_path / "jobs").mkdir()
    (tmp_path / "jobs" / "my_job.py").write_text("x = 1\n")
    (tmp_path / "jobs" / "__pycache__").mkdir()
    (tmp_path / "jobs" / "__pycache__" / "junk.py").write_text("no\n")
    (tmp_path / "jobs" / "data.bin").write_bytes(b"\x00")
    (tmp_path / "conf").mkdir()
    (tmp_path / "conf" / "jobs.yml").write_text("jobs: {}\n")
    (tmp_path / "conf" / "connections.cfg").write_text("[db]\nuser=u\npassword=p\n")
    return str(tmp_path)


def _runner(project, emr=None, s3=None, **cfg):
    config = {
        "job_name": "jobs/my_job.py",
        "s3_bucket": "my-bucket",
        "project_dir": project,
        **cfg,
    }
    return DeployRunner(config, session=FakeSession(s3=s3, emr=emr), now_str="20260101T000000")


def test_package_project_contents(project, tmp_path):
    out = package_project(project, str(tmp_path / "scripts.tar.gz"))
    with tarfile.open(out) as tf:
        names = set(tf.getnames())
    assert "jobs/my_job.py" in names
    assert "conf/jobs.yml" in names
    assert not any("__pycache__" in n for n in names)  # caches excluded
    assert not any(n.endswith(".bin") for n in names)  # binaries excluded
    # credentials never ride the code tarball (they'd land in the
    # deploy/log bucket) — ship via secrets channel or extra_files
    assert not any(n.endswith(".cfg") for n in names)


def test_package_project_excludes_secrets_even_with_custom_extensions(project, tmp_path):
    out = package_project(
        project, str(tmp_path / "s.tar.gz"), extensions=(".py", ".yml", ".cfg")
    )
    with tarfile.open(out) as tf:
        names = set(tf.getnames())
    assert "conf/connections.cfg" not in names


def test_pipeline_name_roundtrip():
    name = pipeline_name("jobs/my_job.py", "20260101T000000")
    assert job_name_from_pipeline(name) == "jobs/my_job.py"


def test_run_direct_creates_cluster_and_submits_step(project):
    emr, s3 = FakeEMR(), FakeS3()
    runner = _runner(project, emr=emr, s3=s3)
    cluster_id, step_ids = runner.run()
    assert cluster_id == "j-NEW" and step_ids == ["s-0"]
    # cluster spec carried the pipeline name and the uploaded package path
    spec = emr.run_job_flow_calls[0]
    assert spec["Name"] == runner.pipeline_name
    boot = spec["BootstrapActions"][0]["ScriptBootstrapAction"]["Path"]
    assert boot.startswith("s3://my-bucket/") and boot.endswith("setup_nodes.sh")
    # the step wraps a spark-submit argv through command-runner.jar and
    # its primary resource is the path the bootstrap extracted to —
    # not a laptop-relative path that doesn't exist on the master
    _, steps = emr.step_calls[0]
    assert steps[0]["HadoopJarStep"]["Jar"] == "command-runner.jar"
    argv = steps[0]["HadoopJarStep"]["Args"]
    assert "spark-submit" in argv[0]
    assert "/home/hadoop/app/yaetos_spark/cli.py" in argv
    assert "/home/hadoop/app/scripts.zip" in argv
    # the package and the bootstrap script landed under the pipeline prefix
    keys = {k for (_, k) in s3.objects}
    assert any(k.endswith("scripts.tar.gz") for k in keys)
    assert any(k.endswith("setup_nodes.sh") for k in keys)
    assert all(runner.pipeline_name in k for k in keys)
    # the bootstrap actually fetches + extracts the uploaded package
    boot_key = next(k for k in keys if k.endswith("setup_nodes.sh"))
    boot = s3.objects[("my-bucket", boot_key)].decode()
    assert f"aws s3 cp s3://my-bucket/{runner.package_path}/scripts.tar.gz" in boot
    assert "tar -xzf /home/hadoop/scripts.tar.gz -C /home/hadoop/app" in boot
    assert "scripts.zip" in boot


def test_run_direct_reuses_explicit_cluster_id(project):
    emr = FakeEMR(clusters=[("j-OTHER", "someone-elses")])
    cluster_id, _ = _runner(project, emr=emr, cluster_id="j-MINE").run()
    assert cluster_id == "j-MINE"
    assert emr.run_job_flow_calls == []  # no new cluster


def test_run_direct_reuse_active_framework_cluster(project):
    emr = FakeEMR(clusters=[("j-X", "unrelated"), ("j-Y", "yaetos_spark__old__1")])
    cluster_id, _ = _runner(project, emr=emr, reuse_cluster=True).run()
    assert cluster_id == "j-Y"  # first framework-named active cluster
    assert emr.run_job_flow_calls == []


def test_run_direct_missing_bucket_fails_fast(project):
    with pytest.raises(ValueError, match="does not exist"):
        _runner(project, s3=FakeS3(buckets=("other",))).run()


def test_run_k8s_builds_argv_and_invokes_runner(project):
    captured = {}

    def fake_submit(argv):
        captured["argv"] = argv
        return 0

    runner = _runner(
        project,
        deploy="k8s",
        k8s_url="k8s://https://1.2.3.4:6443",
        k8s_image="repo/spark:latest",
        submit_runner=fake_submit,
    )
    assert runner.run() == 0
    argv = captured["argv"]
    assert argv[0].endswith("spark-submit")
    assert "k8s://https://1.2.3.4:6443" in argv
    joined = " ".join(argv)
    assert "spark.kubernetes.container.image=repo/spark:latest" in joined


def test_idle_termination_script_uploaded_when_configured(project):
    emr, s3 = FakeEMR(), FakeS3()
    runner = _runner(project, emr=emr, s3=s3, terminate_idle_after_min=45)
    runner.run()
    keys = {k for (_, k) in s3.objects}
    idle = [k for k in keys if k.endswith("terminate_idle_cluster.sh")]
    assert idle, "watchdog script not uploaded"
    body = s3.objects[("my-bucket", idle[0])].decode()
    assert "IDLE_LIMIT_SEC=2700" in body  # 45 min
    assert "shutdown -h now" in body
    # and the bootstrap launches it on the master, so the watchdog is
    # live — not an uploaded-but-never-executed artifact
    boot_key = next(k for (_, k) in s3.objects if k.endswith("setup_nodes.sh"))
    boot = s3.objects[("my-bucket", boot_key)].decode()
    assert "terminate_idle_cluster.sh" in boot
    assert "nohup /home/hadoop/terminate_idle_cluster.sh" in boot
    assert '"isMaster": true' in boot  # master-only guard

    # not uploaded (and not wired) unless asked for
    s3b = FakeS3()
    _runner(project, emr=FakeEMR(), s3=s3b).run()
    assert not any(k.endswith("terminate_idle_cluster.sh") for (_, k) in s3b.objects)
    boot_key_b = next(k for (_, k) in s3b.objects if k.endswith("setup_nodes.sh"))
    assert "terminate_idle_cluster" not in s3b.objects[("my-bucket", boot_key_b)].decode()


# -- registry-driven deployer job (reference: jobs/generic/deployer.py:1-8,
#    a manifest entry whose whole body is "deploy code / another job") ----


def test_deployer_job_code_only_uploads_without_cluster(project):
    from jobs.generic.deployer_job import DeployerJob

    emr, s3 = FakeEMR(), FakeS3()
    job = DeployerJob(
        {
            "job_name": "deploy_code",
            "deploy_option": "deploy_code_only",
            "deploy_config": {
                "job_name": "jobs/my_job.py",
                "s3_bucket": "my-bucket",
                "project_dir": project,
            },
            "boto3_session": FakeSession(s3=s3, emr=emr),
            "deploy_now_str": "20260101T000000",
        }
    )
    assert job.transform() is None
    # the code tarball and bootstrap script landed in the deploy bucket...
    names = {k.rsplit("/", 1)[-1] for (_, k) in s3.objects}
    assert {"scripts.tar.gz", "setup_nodes.sh"} <= names
    assert job.uploaded_keys
    # ...and NO cluster was created, NO step submitted (skip_job parity)
    assert emr.run_job_flow_calls == []
    assert emr.step_calls == []


def test_deployer_job_full_deploy_submits_step(project):
    from jobs.generic.deployer_job import DeployerJob

    emr, s3 = FakeEMR(), FakeS3()
    job = DeployerJob(
        {
            "job_name": "deploy_code",
            "deploy_option": "deploy_job",
            "target_job": "jobs/my_job.py",
            "deploy_config": {
                "s3_bucket": "my-bucket",
                "project_dir": project,
            },
            "boto3_session": FakeSession(s3=s3, emr=emr),
            "deploy_now_str": "20260101T000000",
        }
    )
    assert job.transform() is None
    cluster_id, step_ids = job.deploy_result
    assert cluster_id == "j-NEW" and step_ids
    assert emr.run_job_flow_calls and emr.step_calls


def test_deployer_job_rejects_unknown_option(project):
    from jobs.generic.deployer_job import DeployerJob

    job = DeployerJob(
        {
            "deploy_option": "deploy_everything",
            "deploy_config": {"s3_bucket": "b", "project_dir": project},
            "boto3_session": FakeSession(),
        }
    )
    with pytest.raises(ValueError, match="deploy_option"):
        job.transform()


def test_deployer_manifest_entry_resolves_to_deployer_job():
    """conf/jobs.yml's deploy_code entry must route through the normal
    registry -> job_factory path (the reference drives its deployer from
    the manifest, not a bespoke CLI)."""
    from jobs.generic.deployer_job import DeployerJob
    from yaetos_spark.cli import job_factory
    from yaetos_spark.plans.registry import Registry

    reg = Registry.from_file(os.path.join(os.path.dirname(__file__), "..", "conf", "jobs.yml"))
    params = reg.job_params("deploy_code")
    job = job_factory(reg)("deploy_code", params)
    assert isinstance(job, DeployerJob)
    assert params["deploy_option"] == "deploy_code_only"
    assert params["deploy_config"]["s3_bucket"] == "my-deploy-bucket"
