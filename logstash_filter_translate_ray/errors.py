"""Error types mirroring the reference's failure modes.

Reference: LogStash::ConfigurationError raised throughout
``lib/logstash/filters/translate.rb:183-262`` and
``Dictionary::DictionaryFileError`` at
``lib/logstash/filters/dictionary/file.rb:6,119-121``.
"""


class ConfigurationError(ValueError):
    """Invalid plugin configuration (mirrors LogStash::ConfigurationError)."""


class DictionaryFileError(RuntimeError):
    """First-time dictionary file load failure (fails pipeline startup).

    Refresh-time failures do NOT raise this; they keep the old dictionary
    (reference dictionary/file.rb:57-61,116-125).
    """
