"""TOML config loader parity (configgen.py:122-155 semantics)."""

import pytest

from vectordb_data_ingestion_spark.config import (
    VectorClassConfig,
    load_config_str,
)

SAMPLE = """
[ingest_config]
site_url = "https://example.test/sites/kb"
folder = "/Shared Documents/KB"
local_filepath = "/data"

[llm_service_config]
api_proxy_url = "https://gateway.example.test"
embedding_engine = "text-embedding-ada-002"
vector_db_url = "http://vectordb.example.test:8080"

[query_config]
context_top_n = 3
top_n_documents = 3
all_top_n = -1

[[query_config.vector_classes]]
label = "Articles"
weaviate_class = "KbArticle"
properties = ["text", "filename", "url"]
as_context = true
url_property = "url"

[[query_config.vector_classes]]
label = "Community"
class = "CommunityPosts"
properties = ["text", "url"]
top_by_certainty = 0.9

[custom_section]
anything = "goes"
"""


def test_sections_become_attributes():
    cfg = load_config_str(SAMPLE)
    assert cfg.llm_service_config.embedding_engine == "text-embedding-ada-002"
    assert cfg.ingest_config.folder == "/Shared Documents/KB"
    # unknown sections still load (dynamic fallback, configgen.py:145-148)
    assert cfg.custom_section.anything == "goes"


def test_vector_classes_map_keyed_by_label():
    cfg = load_config_str(SAMPLE)
    qc = cfg.query_config
    assert set(qc.vector_classes_map) == {"Articles", "Community"}
    # both 'weaviate_class' and 'class' keys accepted (cfg.toml:29,35)
    assert cfg.vector_class("Articles").class_name == "KbArticle"
    assert cfg.vector_class("Community").class_name == "CommunityPosts"


def test_certainty_threshold_and_defaults():
    cfg = load_config_str(SAMPLE)
    assert cfg.vector_class("Community").top_by_certainty == 0.9
    assert cfg.vector_class("Articles").top_by_certainty is None
    assert cfg.vector_class("Articles").as_context is True
    assert cfg.query_config.get("context_top_n") == 3


def test_sink_properties_payload():
    vc = load_config_str(SAMPLE).vector_class("Articles")
    assert vc.sink_properties() == [
        {"name": "text", "dataType": ["text"]},
        {"name": "filename", "dataType": ["text"]},
        {"name": "url", "dataType": ["text"]},
    ]


def test_missing_label_or_class_raises():
    with pytest.raises(ValueError):
        VectorClassConfig.from_dict({"label": "x"})
    with pytest.raises(KeyError):
        load_config_str(SAMPLE).vector_class("nope")
