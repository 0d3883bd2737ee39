from .dictionary_service import DictionaryService, get_or_create_dictionary_service

__all__ = ["DictionaryService", "get_or_create_dictionary_service"]
