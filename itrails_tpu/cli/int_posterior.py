"""``itrails-tpu-int-posterior``: introgression-model posterior decoding
(reference workflow_int_posterior.py)."""

from __future__ import annotations

from itrails_tpu.cli import decode


def main(argv=None):
    decode.decode_main(
        argv,
        "Introgression posterior workflow using iTRAILS-TPU",
        usage=("itrails-tpu-int-posterior --config-file CONFIG_FILE --input "
               "PATH_MAF --output OUTPUT_PATH --PARAMETERS"),
        introgression=True,
        posterior=True,
    )


if __name__ == "__main__":
    main()
