"""Ruby (Onigmo) regex dialect conformance for ExactRegex dictionary keys
(memory.rb:21-23 compiles keys with Ruby Regexp.new): each idiom either
behaves as it would in the reference or raises a ConfigurationError naming
the key — never a silent semantic divergence."""

import pytest

from logstash_filter_translate_ray import DictSnapshot, TranslateConfig
from logstash_filter_translate_ray.errors import ConfigurationError
from logstash_filter_translate_ray.regex_dialect import ruby_regex_to_python
from tests.test_kernel import run_both


def _regex_cfg(d):
    return TranslateConfig(source="s", target="t", dictionary=d,
                           exact=True, regex=True)


@pytest.mark.parametrize("pattern,hits,misses", [
    (r"^\h+$", ["deadBEEF123", "0f"], ["xyz", "12g"]),          # \h hex
    (r"^[\h_]+$", ["dead_beef"], ["wxyz"]),                     # \h in class
    (r"^a*+b$", ["aaab", "b"], ["aaa"]),                        # possessive
    (r"^(?>ab|a)bc$", ["abbc"], ["abc"]),                       # atomic group
    (r"^(?<d>\d)\k<d>$", ["77", "00"], ["78"]),                 # named backref
    (r"end\z", ["the end"], ["the end\n"]),                     # \z absolute
    (r"end\Z", ["the end", "the end\n"], ["end here"]),         # \Z pre-\n
    (r"^[[:digit:]]+$", ["123"], ["12a"]),                      # POSIX class
    (r"^[[:alpha:][:digit:]]+$", ["a1B2"], ["a-b"]),            # two POSIX
    (r"(?<=foo)bar", ["xfoobar"], ["xbazbar"]),                 # lookbehind untouched
    (r"(?i:HeLLo)", ["say hello"], ["goodbye"]),                # inline flags
])
def test_ruby_idiom_matches(pattern, hits, misses):
    cfg = _regex_cfg({pattern: "Y"})
    rows = [{"s": v} for v in hits + misses]
    out = run_both(cfg, rows)
    for i, v in enumerate(hits):
        assert out[i]["t"] == "Y", (pattern, v)
    for j in range(len(hits), len(hits) + len(misses)):
        assert out[j].get("t") is None, (pattern, rows[j])


@pytest.mark.parametrize("pattern,frag", [
    (r"\g<name>", r"\g"),                  # subroutine call
    (r"(?~forbidden)", "absence"),         # absence operator
    (r"^[[:^alpha:]]+$", "negated POSIX"), # negated POSIX class
    (r"(?<d>\d)\k<d+1>", "recursion-level"),
])
def test_ruby_only_constructs_rejected_with_key(pattern, frag):
    cfg = _regex_cfg({pattern: "Y"})
    snap = DictSnapshot(cfg.dictionary)
    with pytest.raises(ConfigurationError) as ei:
        snap.regex_rows
    assert repr(pattern)[1:-1] in str(ei.value) or pattern in str(ei.value)
    assert frag in str(ei.value)


def test_translation_is_identity_for_plain_patterns():
    for p in [r"^2\d\d$", r"foo|bar", r"[a-z]+\.txt", r"(?:ab)+c?",
              r"\bword\b", r"\\h"]:   # escaped backslash-h stays literal
        assert ruby_regex_to_python(p) == p


# -- property fuzz: translation is identity ∘ faithful on the common subset

import string

from hypothesis import given, settings, strategies as st

_safe_atoms = st.one_of(
    st.text(alphabet=string.ascii_letters + string.digits + " _-", min_size=1,
            max_size=4).map(lambda s: s),
    st.sampled_from([r"\d", r"\w", r"\s", r"\b", ".", "[a-z]", "[^0-9]",
                     "(?:ab)", "(x|y)", r"\.", r"\\h"]),
)
_quant = st.sampled_from(["", "*", "+", "?", "{1,3}", "*?", "*+"])


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(_safe_atoms, _quant), min_size=1, max_size=5))
def test_shim_identity_on_common_subset(parts):
    """Patterns with no Ruby-only construct translate to themselves and
    still compile (the shim must never corrupt plain regexes)."""
    import re
    pat = "".join(a + q for a, q in parts)
    try:
        re.compile(pat)
    except re.error:
        return                      # random junk like 'a**'; skip
    assert ruby_regex_to_python(pat) == pat


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1,
               max_size=8))
def test_shim_hex_class_matches_ruby_semantics(s):
    """\\h-translated patterns agree with an explicit hex class on random
    subject strings."""
    import re
    p1 = re.compile(ruby_regex_to_python(r"^\h+$"))
    p2 = re.compile(r"^[0-9a-fA-F]+$")
    assert bool(p1.search(s)) == bool(p2.search(s))
