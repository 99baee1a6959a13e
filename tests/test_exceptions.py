"""Exception hierarchy tests."""

import pytest

from rho_tts_tpu import (
    AudioGenerationError,
    FormatConversionError,
    ModelLoadError,
    ProviderNotFoundError,
    RhoTTSError,
)


@pytest.mark.parametrize(
    "exc_cls",
    [ProviderNotFoundError, ModelLoadError, AudioGenerationError, FormatConversionError],
)
def test_inherits_from_base(exc_cls):
    assert issubclass(exc_cls, RhoTTSError)
    assert issubclass(exc_cls, Exception)


@pytest.mark.parametrize(
    "exc_cls",
    [
        RhoTTSError,
        ProviderNotFoundError,
        ModelLoadError,
        AudioGenerationError,
        FormatConversionError,
    ],
)
def test_raise_and_catch(exc_cls):
    with pytest.raises(RhoTTSError):
        raise exc_cls("boom")


def test_message_preserved():
    try:
        raise ModelLoadError("weights missing")
    except RhoTTSError as e:
        assert "weights missing" in str(e)
