"""Text normalization for scoring (CHiME-8 aligned).

Rebuild of /root/reference/utils/text_norm_whisper_like/__init__.py:11-18.
"""
from notsofar_tpu.utils.text_norm.basic import BasicTextNormalizer
from notsofar_tpu.utils.text_norm.english import EnglishTextNormalizer


def get_txt_norm(txt_norm):
    assert txt_norm in ("chime8", None)
    if txt_norm is None:
        return None
    if txt_norm == "chime8":
        return EnglishTextNormalizer()
    raise NotImplementedError(txt_norm)
