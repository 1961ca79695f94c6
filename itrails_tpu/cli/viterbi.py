"""``itrails-tpu-viterbi``: most-likely gene-tree path decoding
(reference workflow_viterbi.py)."""

from __future__ import annotations

from itrails_tpu.cli import decode


def main(argv=None):
    decode.decode_main(
        argv,
        "Viterbi workflow using iTRAILS-TPU",
        usage=("itrails-tpu-viterbi --config-file CONFIG_FILE --input "
               "PATH_MAF --output OUTPUT_PATH --PARAMETERS"),
        introgression=False,
        posterior=False,
    )


if __name__ == "__main__":
    main()
