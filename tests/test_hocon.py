"""HOCON parser: the reference's own test-suite config shape plus the HOCON
features Arc configs rely on (comments, unquoted keys/values, =, optional
commas, substitutions, dotted keys, object merge).

Reference config under test: MaskDataTransformSuite.scala:59-114 (with the
Scala string interpolations pinned to literal URIs)."""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.plans.hocon import HoconError, loads

REFERENCE_SUITE_CONF = """{
  "stages": [
    {
      "type": "DelimitedExtract",
      "name": "test",
      "description": "test",
      "environments": [
        "production",
        "test"
      ],
      "inputURI": "file:/tmp/userdata.csv",
      "outputView": "userdata_raw",
      "header": true
    },
    {
      "type": "TypingTransform",
      "name": "test",
      "description": "test",
      "environments": [
        "production",
        "test"
      ],
      "schemaURI": "file:/tmp/userdata.json",
      "inputView": "userdata_raw",
      "outputView": "userdata",
      "persist": true
    },
    {
      "type": "MaskDataTransform",
      "name": "mask data",
      "environments": [
        "production",
        "test"
      ],
      "inputView": "userdata",
      "outputView": "userdata_masked",
      "persist": true
    }
  ]
}"""


def test_reference_suite_config_parses():
    conf = loads(REFERENCE_SUITE_CONF)
    stages = conf["stages"]
    assert [s["type"] for s in stages] == [
        "DelimitedExtract", "TypingTransform", "MaskDataTransform",
    ]
    assert stages[0]["header"] is True
    assert stages[2]["environments"] == ["production", "test"]


def test_hocon_features():
    conf = loads("""
    # top comment
    stages = [
      {
        type = SQLTransform          // trailing comment
        name = "sql stage"
        environments = [production, test]
        sql = \"\"\"SELECT 1 AS x
FROM t\"\"\"
        persist = true
        retries = 3
        threshold = 0.5
      }
    ]
    runtime { shufflePartitions = 32 }
    runtime { aqe = true }           # merged, not replaced
    app.name = demo
    """)
    st = conf["stages"][0]
    assert st["type"] == "SQLTransform"
    assert st["environments"] == ["production", "test"]
    assert st["sql"] == "SELECT 1 AS x\nFROM t"
    assert st["retries"] == 3 and st["threshold"] == 0.5
    assert conf["runtime"] == {"shufflePartitions": 32, "aqe": True}
    assert conf["app"] == {"name": "demo"}


def test_substitutions(monkeypatch):
    monkeypatch.setenv("T_HOCON_ENV", "from-env")
    conf = loads("""
    base = /data
    inputURI = ${base}
    fromEnv = ${T_HOCON_ENV}
    missing = ${?NOT_SET_ANYWHERE}
    """)
    assert conf["inputURI"] == "/data"
    assert conf["fromEnv"] == "from-env"
    assert "missing" not in conf


def test_unresolved_substitution_raises():
    with pytest.raises(HoconError, match="could not resolve"):
        loads("a = ${nope.nothing}")


def test_pipeline_accepts_hocon():
    from arc_maskdata_pipeline_plugin_spark.plans.pipeline import Pipeline

    p = Pipeline.from_config("""
    stages = [
      {
        type = SQLTransform
        name = hocon-sql
        environments = [test]
        sql = "SELECT 1 AS one"
        outputView = out
      }
    ]
    """)
    assert len(p.stages) == 1
    assert p.stages[0].name == "hocon-sql"


def test_pipeline_hocon_end_to_end(spark, tmp_path):
    """Reference-shaped HOCON config through the actual runner."""
    import pyspark.sql.functions as F

    from arc_maskdata_pipeline_plugin_spark.operators import PipelineContext
    from arc_maskdata_pipeline_plugin_spark.plans.pipeline import Pipeline

    csv = tmp_path / "users.csv"
    csv.write_text("id,name\n1,alice\n2,bob\n")
    p = Pipeline.from_config(f"""
    stages = [
      {{
        type = DelimitedExtract
        name = extract
        environments = [production, test]
        inputURI = "{csv}"
        outputView = users_raw
        header = true
      }}
      {{
        type = SQLTransform
        name = project
        environments = [production, test]
        sql = "SELECT id, upper(name) AS name FROM users_raw"
        outputView = users_up
      }}
    ]
    """)
    ctx = PipelineContext(spark=spark, environment="test")
    out = p.run(ctx)
    assert {(r.id, r.name) for r in out.collect()} == {("1", "ALICE"), ("2", "BOB")}


# ---------------------------------------------------------------------------
# Property: the parser is a JSON superset — any JSON document parses to the
# same value json.loads gives (hypothesis-generated).
# ---------------------------------------------------------------------------

import json

from hypothesis import given, settings
from hypothesis import strategies as st

_scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
        max_size=20,
    ),
    st.none(),
)
_json_vals = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1,
                max_size=8,
            ),
            inner,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=8), _json_vals, max_size=4))
def test_hocon_parses_arbitrary_json(doc):
    text = json.dumps(doc)
    assert loads(text) == json.loads(text)
