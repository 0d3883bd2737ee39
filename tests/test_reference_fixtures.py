"""Parity against the REFERENCE's own fixture files (read-only at
/root/reference/spec/fixtures) — "matches the reference's results on its
own test inputs". Skipped gracefully if the reference tree is absent."""

import os

import pytest

from logstash_filter_translate_ray import DictSnapshot, TranslateConfig, translate_row
from logstash_filter_translate_ray.dictionary import FileDictionary, load_yaml_items

REF_FIX = "/root/reference/spec/fixtures"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_FIX),
                                reason="reference fixtures not present")


def test_reference_dict_yml():
    # translate_spec.rb:233-241 — typed values from the reference's dict.yml
    d = FileDictionary(f"{REF_FIX}/dict.yml", refresh_interval=-1)
    assert d.snapshot.map["a"] == 1
    assert d.snapshot.map["d"] == {"e": [1, "hello", True, "false", "1", "1.1"]}
    ev = {"status": "a"}
    cfg = TranslateConfig(source="status", target="translation",
                          dictionary_path=f"{REF_FIX}/dict.yml",
                          refresh_interval=-1)
    translate_row(ev, cfg, d.snapshot)
    assert ev["translation"] == 1


def test_reference_dict_json_csv():
    dj = FileDictionary(f"{REF_FIX}/dict.json", refresh_interval=-1)
    assert dj.snapshot.map == {"a": 10, "b": 20, "c": 30}
    dc = FileDictionary(f"{REF_FIX}/dict.csv", refresh_interval=-1)
    assert dc.snapshot.map == {"a": "100", "b": "200", "c": "300"}


def test_reference_regex_dict():
    # translate_spec.rb:141-160 — "200" → "OK" through the file regex dict
    d = FileDictionary(f"{REF_FIX}/regex_dict.csv", refresh_interval=-1)
    cfg = TranslateConfig(source="status", target="translation", regex=True,
                          dictionary_path=f"{REF_FIX}/regex_dict.csv",
                          refresh_interval=-1)
    ev = {"status": "200"}
    translate_row(ev, cfg, d.snapshot)
    assert ev["translation"] == "OK"


def test_reference_regex_union_dict():
    # translate_spec.rb:96-117 — "200 & 500" → "OK & Server Error"
    d = FileDictionary(f"{REF_FIX}/regex_union_dict.csv", refresh_interval=-1)
    cfg = TranslateConfig(source="status", target="translation", exact=False,
                          dictionary_path=f"{REF_FIX}/regex_union_dict.csv",
                          refresh_interval=-1)
    ev = {"status": "200 & 500"}
    translate_row(ev, cfg, d.snapshot)
    assert ev["translation"] == "OK & Server Error"


def test_reference_tagged_yaml_dicts():
    # translate_spec.rb:336-356 — !!map and !!omap fixtures
    dm = FileDictionary(f"{REF_FIX}/tag-map-dict.yml", refresh_interval=-1)
    assert dm.snapshot.map["six"] == "val-6-1|val-6-2"
    do = FileDictionary(f"{REF_FIX}/tag-omap-dict.yml", refresh_interval=-1)
    assert do.snapshot.map["nine"] == "val-9-1|val-9-2"
    # streaming strategy parses the same files to the same dict
    for name in ["dict.yml", "tag-map-dict.yml", "tag-omap-dict.yml"]:
        assert dict(load_yaml_items(f"{REF_FIX}/{name}", strategy="one_shot")) == \
            dict(load_yaml_items(f"{REF_FIX}/{name}", strategy="streaming"))


def test_reference_malformed_and_unknown():
    # translate_spec.rb:227-230 and 381-387
    from logstash_filter_translate_ray import DictionaryFileError
    with pytest.raises(DictionaryFileError):
        FileDictionary(f"{REF_FIX}/dict-wrong.yml", refresh_interval=-1)
    with pytest.raises(Exception, match="non valid format"):
        FileDictionary(f"{REF_FIX}/dict.other", refresh_interval=-1)


def test_reference_kernel_batch_parity():
    """The vectorized kernel over the reference's fixture dictionaries."""
    import pyarrow as pa
    from logstash_filter_translate_ray import translate_table

    d = FileDictionary(f"{REF_FIX}/tag-map-dict.yml", refresh_interval=-1)
    cfg = TranslateConfig(iterate_on="foo", source="foo", target="baz",
                          fallback="nooo",
                          dictionary_path=f"{REF_FIX}/tag-map-dict.yml",
                          refresh_interval=-1)
    t = pa.table({"foo": pa.array([["nine", "eight", "seven"]],
                                  type=pa.list_(pa.string()))})
    out = translate_table(t, cfg, d.snapshot).to_pylist()
    # translate_spec.rb:404-412 expected values, verbatim
    assert out[0]["baz"] == ["val-9-1|val-9-2", "val-8-1|val-8-2",
                            "val-7-1|val-7-2"]
