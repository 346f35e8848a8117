import datetime as dt
import os

import pytest

from yaetos_spark.plans import incremental as inc
from yaetos_spark.plans import params as P
from yaetos_spark.plans import paths as PH
from yaetos_spark.plans.flow import execution_order
from yaetos_spark.plans.registry import Registry


def test_now_stamp_format():
    s = PH.now_stamp(dt.datetime(2024, 3, 5, 7, 9, 11, tzinfo=dt.timezone.utc))
    assert s == "date20240305_time070911_utc"


def test_expand_latest_and_now(tmp_path):
    for d in ["date20240101_time000000_utc", "date20240301_time120000_utc"]:
        os.makedirs(tmp_path / "out" / d)
    p = PH.expand_latest(str(tmp_path / "out" / "{{latest}}" / "data"))
    assert p.endswith("date20240301_time120000_utc/data")
    now = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
    assert "date20240501_time000000_utc" in PH.expand_now("x/{{now}}/y", now)


def test_expand_path_params(tmp_path):
    os.makedirs(tmp_path / "base" / "v1")
    out = PH.expand_path(
        "{{base_path}}/{{latest}}/file", {"base_path": str(tmp_path / "base")}
    )
    assert out == f"{tmp_path}/base/v1/file"


def test_s3_rewrite():
    assert PH.to_spark_path("s3://bucket/k") == "s3a://bucket/k"
    assert PH.is_s3_path("s3a://b/k")


def test_merge_params_layering():
    merged = P.merge_params(
        yml_common={"base_path": "/common", "x": 1},
        mode_specific={"base_path": "/mode"},
        job_yml={"inputs": {"a": {"path": "p1", "type": "csv"}}, "x": 2},
        job_args={"inputs": {"a": {"type": "parquet"}}},
        cmd_args={"y": "z"},
    )
    assert merged["base_path"] == "/mode"
    assert merged["x"] == 2
    assert merged["y"] == "z"
    # dict-merge at input level: path survives, type overridden
    assert merged["inputs"]["a"] == {"path": "p1", "type": "parquet"}


def test_is_incremental_detection():
    assert P.merge_params(job_yml={"inputs": {"a": {"inc_field": "ts"}}})["is_incremental"]
    assert not P.merge_params(job_yml={"inputs": {"a": {"path": "x"}}})["is_incremental"]


def test_replace_placeholders_recursive():
    params = {
        "base": "/data",
        "sub": "{{base}}/stage",
        "inputs": {"a": {"path": "{{sub}}/a/{{latest}}"}},
    }
    out = P.replace_placeholders(params)
    # {{latest}} is preserved for path-expansion time
    assert out["inputs"]["a"]["path"] == "/data/stage/a/{{latest}}"


def test_registry_and_flow(tmp_path):
    yml = tmp_path / "jobs.yml"
    yml.write_text(
        """
common_params:
  all_mode_params:
    base_path: /tmp/data
    mode: dev
  mode_specific_params:
    prod:
      base_path: /prod/data
jobs:
  a: {output: {path: '{{base_path}}/a'}}
  b: {dependencies: [a], output: {path: '{{base_path}}/b'}}
  c: {dependencies: [a, b]}
"""
    )
    reg = Registry.from_file(str(yml))
    assert reg.job_params("a")["output"]["path"] == "/tmp/data/a"
    assert reg.job_params("a", mode="prod")["output"]["path"] == "/prod/data/a"
    order = execution_order(reg, "c")
    assert order.index("a") < order.index("b") < order.index("c")


def test_periods():
    ps = inc.get_periods("2024-01-30", dt.date(2024, 2, 2))
    assert ps == ["2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"]


def test_filter_incremental_inputs(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 10:00:00"), (3, "2024-01-03 10:00:00")],
        "id int, ts string",
    ).selectExpr("id", "cast(ts as timestamp) as ts")
    out = inc.filter_incremental_inputs({"t": df}, {"t": {"inc_field": "ts"}}, period="2024-01-02")
    assert [r.id for r in out["t"].collect()] == [2]
    out2 = inc.filter_incremental_inputs(
        {"t": df}, {"t": {"inc_field": "ts"}}, min_exclusive="2024-01-01 10:00:00"
    )
    assert sorted(r.id for r in out2["t"].collect()) == [2, 3]


def test_output_max_timestamp(spark, tmp_path):
    df = spark.createDataFrame([(1, "2024-01-05")], "id int, d string")
    path = str(tmp_path / "out")
    df.write.parquet(path)
    assert inc.get_output_max_timestamp(spark, path, "d") == "2024-01-05"
    assert inc.get_output_max_timestamp(spark, str(tmp_path / "missing"), "d") is None


def test_output_max_timestamp_unreadable_existing_output_raises(spark, tmp_path):
    """An EXISTING but unreadable previous output must raise, not
    return None: None means 'first run', and incremental jobs append —
    a swallowed read error would re-process the full history into the
    existing output (silent duplication)."""
    import pytest

    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_text("not parquet at all")
    with pytest.raises(Exception):
        inc.get_output_max_timestamp(spark, str(bad), "d")


def test_output_max_timestamp_crashed_first_write_is_cold_start(spark, tmp_path):
    """A directory holding only write-protocol droppings (_temporary/,
    _SUCCESS, .spark-staging-*) is the footprint of a FIRST write that
    crashed before committing any data file. That is a cold start
    (return None), not an existing output: treating it as warm makes
    spark.read raise 'unable to infer schema' on every retry until a
    human deletes the dir."""
    crashed = tmp_path / "crashed"
    (crashed / "_temporary" / "0").mkdir(parents=True)
    (crashed / ".spark-staging-xyz").mkdir()
    assert inc.get_output_max_timestamp(spark, str(crashed), "d") is None


def test_dataset_exists_vs_path_exists(spark, tmp_path):
    """dataset_exists = path exists AND has >=1 non-hidden entry; a
    partition-subdir layout counts as data, hidden-only dirs do not."""
    assert not PH.dataset_exists(str(tmp_path / "missing"))
    crashed = tmp_path / "crashed"
    (crashed / "_temporary").mkdir(parents=True)
    (crashed / "_SUCCESS").write_text("")
    assert PH.path_exists(str(crashed))
    assert not PH.dataset_exists(str(crashed))
    # committed flat layout
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "part-00000.parquet").write_text("x")
    assert PH.dataset_exists(str(flat))
    # committed partitioned layout: partition dir, data file nested
    part = tmp_path / "part"
    (part / "batch=3").mkdir(parents=True)
    (part / "_SUCCESS").write_text("")
    assert PH.dataset_exists(str(part))
    # underscore-named partition COLUMN (the streaming dedup index is
    # partitioned by _batch_id): `_x=v` is data per Spark's own
    # visibility rule, not a hidden write-protocol entry
    upart = tmp_path / "upart"
    (upart / "_batch_id=0").mkdir(parents=True)
    assert PH.dataset_exists(str(upart))


def test_dataset_exists_hadoop_fs_branch_via_file_scheme(spark, tmp_path):
    """Same verdicts through the JVM Hadoop FileSystem branch (a
    file:// URI), which is what s3a/hdfs paths hit in production."""
    crashed = tmp_path / "crashed"
    (crashed / "_temporary" / "0").mkdir(parents=True)
    assert PH.path_exists(f"file://{crashed}", spark)
    assert not PH.dataset_exists(f"file://{crashed}", spark)
    part = tmp_path / "part"
    (part / "_batch_id=7").mkdir(parents=True)
    assert PH.dataset_exists(f"file://{part}", spark)
    assert not PH.dataset_exists(f"file://{tmp_path}/missing", spark)
    with pytest.raises(ValueError):
        PH.dataset_exists(f"file://{part}")  # remote scheme needs a session


# -- reference param-stack edge cases (etl_utils_test.py:106-237) -----


def test_replace_placeholders_reference_nested_case():
    """Ported verbatim from the reference's test_replace_placeholders
    (tests/yaetos/etl_utils_test.py:197-208): substitution reaches into
    lists and nested dicts, and chains transitively (key3 → key4 →
    key5)."""
    params = {
        "key1": ["I like {{key2}} pie", "other_value"],
        "key2": "some_value",
        "key3": {"other_key": "a long string with {{key4}} in {{key5}}"},
        "key4": "value_2 and {{key5}}",
        "key5": "value_3",
    }
    assert P.replace_placeholders(params) == {
        "key1": ["I like some_value pie", "other_value"],
        "key2": "some_value",
        "key3": {"other_key": "a long string with value_2 and value_3 in value_3"},
        "key4": "value_2 and value_3",
        "key5": "value_3",
    }


def test_replace_placeholders_reference_pb_case():
    """Reference test_replace_placeholders_pb_case: a value whose own
    substitution introduces another placeholder still fully resolves."""
    params = {
        "output": {"path": "{{base_path}}/some_path/"},
        "base_path": "s3://some_bucket_in_{{region}}",
        "region": "us",
    }
    assert P.replace_placeholders(params) == {
        "output": {"path": "s3://some_bucket_in_us/some_path/"},
        "base_path": "s3://some_bucket_in_us",
        "region": "us",
    }


def test_replace_placeholders_reference_missing_key_case():
    """Reference test_replace_placeholders_missing_cases: unknown keys
    stay as literal {{key}} text while known ones resolve around them."""
    params = {
        "key1": ["I like {{key2}} pie", "other_value"],
        "key2": "some_value",
        "key3": {"other_key": "a long string with {{key4}} in {{key5}} and {{key4}}"},
        "key4": "value_2",
    }
    assert P.replace_placeholders(params) == {
        "key1": ["I like some_value pie", "other_value"],
        "key2": "some_value",
        "key3": {"other_key": "a long string with value_2 in {{key5}} and value_2"},
        "key4": "value_2",
    }


def test_registry_multi_mode_overlay(tmp_path):
    """Reference test_set_modes: yml_modes 'dev_EMR,your_extra_tenant'
    applies BOTH overlays, later mode winning on conflicts."""
    yml = tmp_path / "jobs.yml"
    yml.write_text(
        """
common_params:
  all_mode_params:
    base_path: /tmp/data
    save_schemas: true
    mode: dev
  mode_specific_params:
    dev:
      save_schemas: false
      schema: sandbox
    tenant:
      other_param: some_value
      schema: tenant_schema
jobs:
  a: {output: {path: '{{base_path}}/a'}}
"""
    )
    reg = Registry.from_file(str(yml))
    p = reg.job_params("a", mode="dev,tenant")
    assert p["save_schemas"] is False          # from dev overlay
    assert p["other_param"] == "some_value"    # from tenant overlay
    assert p["schema"] == "tenant_schema"      # later mode wins
    # single mode unaffected
    assert reg.job_params("a", mode="dev")["schema"] == "sandbox"


# -- hypothesis rules over the same subsystem -------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_keys = st.sampled_from([f"k{i}" for i in range(6)])


def _naive_fixed_point(params):
    """Oracle: repeatedly do one global substitution pass until stable."""
    import re as _re

    scalars = {k: v for k, v in params.items() if isinstance(v, (str, int, float))}

    def sub_once(s):
        return _re.sub(
            r"\{\{(\w+)\}\}",
            lambda m: m.group(0)
            if m.group(1) in ("latest", "now") or m.group(1) not in scalars
            else str(scalars[m.group(1)]),
            s,
        )

    def walk(v):
        if isinstance(v, str):
            prev = None
            for _ in range(10):
                if v == prev:
                    break
                prev, v = v, sub_once(v)
            return v
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        if isinstance(v, list):
            return [walk(x) for x in v]
        return v

    return {k: walk(v) for k, v in params.items()}


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    defs=st.dictionaries(
        _keys,
        st.one_of(
            st.text(alphabet="ab/_", max_size=6),
            st.builds(lambda k: f"pre_{{{{{k}}}}}_post", _keys),
            st.integers(-99, 99),
        ),
        max_size=6,
    ),
    template=st.builds(
        lambda a, b: f"x {{{{{a}}}}} y {{{{{b}}}}} z {{{{latest}}}}", _keys, _keys
    ),
)
def test_replace_placeholders_matches_naive_fixed_point(defs, template):
    """For ANY random definition map (chains, cycles, missing keys,
    int values), the implementation equals a naive iterate-to-fixed-
    point oracle, never throws, and preserves {{latest}}/{{now}}."""
    params = {**defs, "tmpl": template, "nested": {"lst": [template]}}
    got = P.replace_placeholders(params)
    want = _naive_fixed_point(params)
    assert got == want
    assert "{{latest}}" in got["tmpl"]  # path-expansion markers survive
    # a second pass still matches the oracle (true idempotence is
    # impossible under self-referential cycles with bounded depth —
    # both sides must keep agreeing instead)
    assert P.replace_placeholders(got) == _naive_fixed_point(got)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    layers=st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "mode"]),
            st.one_of(st.text(max_size=4), st.integers(0, 9)),
            max_size=4,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_merge_params_last_layer_wins(layers):
    """Scalar keys always resolve to the LAST layer that set them —
    the mode-overlay contract the whole registry rests on."""
    merged = P.merge_params(*(layers + [None] * (5 - len(layers))))
    for key in {k for layer in layers for k in layer}:
        expect = next(layer[key] for layer in reversed(layers) if key in layer)
        assert merged[key] == expect


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    base=st.dictionaries(
        st.sampled_from(["i1", "i2", "i3"]),
        st.fixed_dictionaries({"path": st.text(alphabet="xy/", max_size=5)}),
        max_size=3,
    ),
    override=st.dictionaries(
        st.sampled_from(["i1", "i2", "i3"]),
        st.fixed_dictionaries({"type": st.sampled_from(["csv", "parquet"])}),
        max_size=3,
    ),
)
def test_merge_params_inputs_deep_merge(base, override):
    """inputs merge per-key one level deep: an override layer setting
    only 'type' must never erase the base layer's 'path'."""
    merged = P.merge_params(job_yml={"inputs": base}, job_args={"inputs": override})
    assert set(merged["inputs"]) == set(base) | set(override)
    for k in merged["inputs"]:
        if k in base:
            assert merged["inputs"][k].get("path") == base[k]["path"]
        if k in override:
            assert merged["inputs"][k].get("type") == override[k]["type"]


def test_expand_latest_hadoop_fs_branch_via_file_scheme(spark, tmp_path):
    """{{latest}} through the JVM Hadoop FileSystem.listStatus branch
    (paths.py:34-46) — previously only reachable via S3.  A file://
    scheme URI exercises the identical code path in-sandbox: directory
    filtering (stray files ignored), lexicographic max, and the
    empty-parent error (VERDICT r5 item 7)."""
    for d in ["date20240101_time000000_utc", "date20240301_time120000_utc"]:
        os.makedirs(tmp_path / "out" / d)
    (tmp_path / "out" / "stray.txt").write_text("not a dir")
    uri = f"file://{tmp_path}/out/{{{{latest}}}}/data"
    got = PH.expand_latest(uri, spark)
    assert got == f"file://{tmp_path}/out/date20240301_time120000_utc/data"

    with pytest.raises(ValueError):
        PH.expand_latest(uri)  # remote scheme without a session is an error

    with pytest.raises(FileNotFoundError):
        PH.expand_latest(f"file://{tmp_path}/missing/{{{{latest}}}}", spark)


def test_expand_path_rejects_unresolved_tokens():
    """A {{token}} surviving expansion (typo'd param, mis-nested
    base_path) must raise, not become a literal '{{token}}/' directory
    that downstream {{latest}} readers silently miss."""
    import pytest

    from yaetos_spark.plans.paths import expand_path

    with pytest.raises(ValueError, match="base_path"):
        expand_path("{{base_path}}/out/{{now}}", {"other": "x"})
    # defined params still expand fine
    assert expand_path("{{base_path}}/out", {"base_path": "/tmp/x"}).endswith("/tmp/x/out")
