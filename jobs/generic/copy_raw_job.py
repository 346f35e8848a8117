"""Raw file copy job — ferry files byte-for-byte, no parsing.

Behavior parity with the reference's copy_raw job (reference:
jobs/generic/copy_raw_job.py:5-24): expand ``{{latest}}`` on the input
root, list files under it with an optional ``regex`` OR ``glob``
filter, expand ``{{now}}`` on the output root, and copy each file to
the mirrored relative location without reading it as data — models,
images, licence files keep their exact bytes, names, and tree shape
(unlike ``CopyJob``, which re-reads and re-writes tabular data and so
changes bytes and file layout).

Registry shape::

    copy_raw_assets:
      py_job: 'jobs.generic.copy_raw_job'
      inputs:
        files_to_copy: {path: '/data/assets/{{latest}}', glob: '**/*.bin'}
      output: {path: '{{base_path}}/assets/{{now}}'}

Driver-side by design: the reference copies on the driver too, and a
file-ferry is I/O-bound metadata work, not a Spark job — there is no
DataFrame to distribute.  S3 endpoints ride the same optional-boto3
gate as deploy (``yaetos_spark/sources/fs_ops.py``).
"""

from __future__ import annotations

from yaetos_spark.job import SparkJob
from yaetos_spark.plans.paths import expand_path
from yaetos_spark.sources.fs_ops import copy_file, list_files


class CopyRawJob(SparkJob):
    def input_specs(self):
        # the input is a FILE TREE, not a table — keep the framework's
        # tabular loader away from it
        return {}

    def transform(self, **dfs):
        spec = (self.params.get("inputs") or {}).get("files_to_copy") or {}
        path_in = expand_path(spec["path"], self.params, self._now, self.spark)
        files = list_files(path_in, regex=spec.get("regex"), globy=spec.get("glob"))

        out_spec = self.output_spec() or {}
        path_out = expand_path(out_spec["path"], self.params, self._now, self.spark)

        for file_in in files:
            file_out = file_in.replace(path_in, path_out, 1)
            copy_file(file_in, file_out)
        self.copied = files
        return None  # no tabular output (reference returns None too)
