"""Registry-driven deployer job — a manifest entry whose whole body is
"deploy another job" (or just the project code) to the cluster.

Behavior parity with the reference's deployer job (reference:
jobs/generic/deployer.py:1-8, driving yaetos/deploy.py:618-658
``deploy_standalone``): the reference registers a job whose args are
``{'skip_job': True, 'deploy': 'code'}`` — i.e. package the project
and push it to the deploy bucket WITHOUT submitting a Spark step — and
whose ``deploy_option`` can be flipped to submit a real job instead.
Here the same two modes ride :class:`yaetos_spark.deploy_run.DeployRunner`:

- ``deploy_option: deploy_code_only`` (default, = the reference file's
  shipped configuration): package → upload tarball + bootstrap scripts
  to ``s3_bucket``; no cluster is created, no step submitted.
- ``deploy_option: deploy_job``: the full execute path — package,
  upload, choose-or-create cluster, submit the spark step for
  ``target_job`` (EMR or k8s per ``deploy_config.deploy``).

Registry shape::

    deploy_code:
      py_job: 'jobs.generic.deployer_job'
      inputs: {}
      output: {type: None}
      deploy_option: deploy_code_only
      deploy_config: {s3_bucket: my-bucket, s3_prefix: pipelines_metadata}

Driver-side by design (like the reference: deployment is an AWS API
conversation, not a Spark plan). boto3 stays optional — constructing
the runner without an injected session goes through the same
import-try gate as every other deploy path.
"""

from __future__ import annotations

from yaetos_spark.job import SparkJob


class DeployerJob(SparkJob):
    def input_specs(self):
        return {}

    def transform(self, **dfs):
        from yaetos_spark.deploy_run import DeployRunner

        config = dict(self.params.get("deploy_config") or {})
        # the job being shipped; defaults to shipping THIS manifest
        # entry's name (matches the reference, where deploy_standalone
        # reuses the calling job's args)
        config.setdefault("job_name", self.params.get("target_job", self.job_name))
        runner = DeployRunner(
            config,
            session=self.params.get("boto3_session"),  # tests inject fakes
            now_str=self.params.get("deploy_now_str"),
        )
        option = self.params.get("deploy_option", "deploy_code_only")
        if option == "deploy_code_only":
            # reference deployer.py ships exactly this: code push, no step
            self.uploaded_keys = runner.s3_ops()
            return None
        if option == "deploy_job":
            self.deploy_result = runner.run()
            return None
        raise ValueError(
            f"unknown deploy_option '{option}' "
            f"(expected 'deploy_code_only' or 'deploy_job')"
        )
