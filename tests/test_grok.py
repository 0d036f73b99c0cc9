"""Grok pattern library + apache parse."""

import pytest

from fluent_plugin_kubernetes_metadata_filter_spark.grok import (
    APACHE_COMBINED,
    compile_grok,
    grok_extract,
)
from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_compile_grok_indices():
    regex, gi = compile_grok("%{IP:ip} %{WORD:verb} %{INT:code}")
    import re

    m = re.search(regex, "10.1.2.3 GET 200")
    assert m.group(gi["ip"]) == "10.1.2.3"
    assert m.group(gi["verb"]) == "GET"
    assert m.group(gi["code"]) == "200"


def test_compile_grok_unknown_pattern():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")


def test_custom_pattern_and_nameless_ref():
    regex, gi = compile_grok(
        "%{SEV:level}: %{GREEDYDATA:msg}", patterns={"SEV": r"(?:LOW|HIGH)"}
    )
    import re

    m = re.search(regex, "HIGH: disk full")
    assert m.group(gi["level"]) == "HIGH" and m.group(gi["msg"]) == "disk full"


def test_grok_apache_on_generated_logs(spark):
    logs = load_table(spark, SF, "logs")
    out = grok_extract(logs, "line", APACHE_COMBINED)
    total = out.count()
    parsed = out.where("grok_matched").count()
    assert 0.85 < parsed / total < 0.99  # ~7% malformed by construction
    row = out.where("grok_matched").first()
    assert row.verb in ("GET", "POST", "PUT", "DELETE")
    assert row.response in ("200", "301", "404", "500")
    assert row.clientip.startswith("10.")
    bad = out.where("NOT grok_matched").first()
    assert bad.verb is None


def test_grok_pandas_equals_native(spark):
    from fluent_plugin_kubernetes_metadata_filter_spark.grok import grok_extract_pandas

    logs = load_table(spark, SF, "logs")
    cols = ["log_id", "clientip", "verb", "request", "response", "bytes", "grok_matched"]
    a = grok_extract(logs, "line", APACHE_COMBINED).select(*cols)
    b = grok_extract_pandas(logs, "line", APACHE_COMBINED).select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
