"""``itrails-tpu-int-viterbi``: introgression-model gene-tree decoding
(reference workflow_int_viterbi.py)."""

from __future__ import annotations

from itrails_tpu.cli import decode


def main(argv=None):
    decode.decode_main(
        argv,
        "Introgression viterbi workflow using iTRAILS-TPU",
        usage=("itrails-tpu-int-viterbi --config-file CONFIG_FILE --input "
               "PATH_MAF --output OUTPUT_PATH --PARAMETERS"),
        introgression=True,
        posterior=False,
    )


if __name__ == "__main__":
    main()
