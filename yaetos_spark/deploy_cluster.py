"""Cluster deploy builders — EMR job-flow / step specs and k8s submit.

Behavior parity: the reference's largest subsystem launches EMR
clusters, adds spark-submit steps, and submits to Kubernetes
(reference: yaetos/deploy.py:98-120, yaetos/deploy_emr.py:95-213,
yaetos/deploy_k8s.py:27-60). The AWS/k8s API calls themselves need
live credentials and a cloud account; what is testable — and what this
module provides — is the exact REQUEST CONSTRUCTION: boto3-shaped
``run_job_flow`` kwargs, ``add_job_flow_steps`` step dicts, and the
k8s spark-submit argv. A thin ``launch`` wrapper applies them through
boto3 when it is available; everything else is pure data, golden-file
testable, no network.
"""

from __future__ import annotations

from yaetos_spark.deploy import build_spark_submit


def build_emr_instance_groups(
    master_type: str = "m5.xlarge",
    core_type: str = "m5.xlarge",
    core_count: int = 2,
    market: str = "ON_DEMAND",
) -> list[dict]:
    """Instance groups (reference: yaetos/deploy_emr.py:60-93 +
    airflow_template.py instance_groups_extra): master always, core
    group only when core_count > 0."""
    groups = [
        {
            "Name": "Main nodes",
            "Market": market,
            "InstanceRole": "MASTER",
            "InstanceType": master_type,
            "InstanceCount": 1,
        }
    ]
    if core_count:
        groups.append(
            {
                "Name": "Secondary nodes",
                "Market": market,
                "InstanceRole": "CORE",
                "InstanceType": core_type,
                "InstanceCount": core_count,
            }
        )
    return groups


def build_emr_cluster_spec(
    pipeline_name: str,
    s3_logs: str,
    package_path: str,
    emr_version: str = "emr-7.2.0",
    instance_groups: list[dict] | None = None,
    ec2_key_name: str | None = None,
    ec2_subnet_id: str | None = None,
    leave_on: bool = False,
    emr_ec2_role: str = "EMR_EC2_DefaultRole",
    emr_role: str = "EMR_DefaultRole",
    applications: list[str] = ("Hadoop", "Spark"),
) -> dict:
    """boto3 ``run_job_flow`` kwargs (reference: deploy_emr.py:95-131).
    Pure data — pass to ``boto3.client('emr').run_job_flow(**spec)``."""
    instances: dict = {
        "InstanceGroups": instance_groups or build_emr_instance_groups(),
        "KeepJobFlowAliveWhenNoSteps": leave_on,
        "TerminationProtected": False,
    }
    if ec2_key_name:
        instances["Ec2KeyName"] = ec2_key_name
    if ec2_subnet_id:
        instances["Ec2SubnetId"] = ec2_subnet_id
    return {
        "Name": pipeline_name,
        "LogUri": s3_logs,
        "ReleaseLabel": emr_version,
        "Instances": instances,
        "Applications": [{"Name": a} for a in applications],
        "Configurations": [
            {
                "Classification": "spark-env",
                "Configurations": [
                    {
                        "Classification": "export",
                        "Properties": {"PYSPARK_PYTHON": "/usr/bin/python3"},
                    }
                ],
            }
        ],
        "JobFlowRole": emr_ec2_role,
        "ServiceRole": emr_role,
        "VisibleToAllUsers": True,
        "BootstrapActions": [
            {
                "Name": "setup_nodes",
                "ScriptBootstrapAction": {
                    "Path": f"{package_path}/setup_nodes.sh",
                    "Args": [],
                },
            }
        ],
    }


def build_emr_spark_step(
    job_args: dict,
    name: str = "Spark Application",
    action_on_failure: str = "CONTINUE",
    **spark_submit_kwargs,
) -> dict:
    """``add_job_flow_steps`` step dict wrapping the spark-submit argv
    (reference: deploy_emr.py:190-213 ``step_spark_submit`` — EMR runs
    it through command-runner.jar)."""
    return {
        "Name": name,
        "ActionOnFailure": action_on_failure,
        "HadoopJarStep": {
            "Jar": "command-runner.jar",
            "Args": build_spark_submit(job_args, **spark_submit_kwargs),
        },
    }


def build_k8s_spark_submit(
    job_args: dict,
    k8s_url: str,
    image: str,
    namespace: str = "default",
    app_name: str = "yaetos-spark-job",
    executor_instances: int = 2,
    upload_path: str | None = None,
    driver_pod_template: str | None = None,
    executor_pod_template: str | None = None,
    extra_conf: dict | None = None,
) -> list[str]:
    """spark-submit argv for Kubernetes (reference:
    yaetos/deploy_k8s.py:27-60 ``get_spark_submit_args_k8s``)."""
    conf = {
        "spark.executor.instances": str(executor_instances),
        "spark.kubernetes.namespace": namespace,
        "spark.kubernetes.container.image": image,
    }
    if upload_path:
        conf["spark.kubernetes.file.upload.path"] = upload_path
    if driver_pod_template:
        conf["spark.kubernetes.driver.podTemplateFile"] = driver_pod_template
    if executor_pod_template:
        conf["spark.kubernetes.executor.podTemplateFile"] = executor_pod_template
    conf.update(extra_conf or {})
    cmd = build_spark_submit(
        job_args, master=k8s_url, deploy_mode="cluster", conf=conf
    )
    # --name goes right after the mode args, like the reference layout
    return cmd[:5] + ["--name", app_name] + cmd[5:]


def launch_emr(cluster_spec: dict, steps: list[dict], region: str | None = None):
    """Apply the built specs through boto3 (import-gated: no boto3 in
    this image). Returns (cluster_id, step_ids)."""
    try:
        import boto3
    except ImportError as exc:
        raise NotImplementedError("EMR launch requires boto3") from exc
    client = boto3.client("emr", region_name=region) if region else boto3.client("emr")
    resp = client.run_job_flow(**cluster_spec)
    cluster_id = resp["JobFlowId"]
    step_resp = client.add_job_flow_steps(JobFlowId=cluster_id, Steps=steps)
    return cluster_id, step_resp.get("StepIds", [])
