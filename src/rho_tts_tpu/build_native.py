"""Build the native C library: ``python -m rho_tts_tpu.build_native``."""

from . import _native


def main() -> int:
    lib = _native.get_lib()
    if lib is None:
        print("native build FAILED (is a C compiler installed?)")
        return 1
    print(f"native library ready: {_native._LIB_PATH}")
    print("levenshtein('kitten','sitting') =", _native.levenshtein("kitten", "sitting"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
