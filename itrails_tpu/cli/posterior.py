"""``itrails-tpu-posterior``: genome-wide posterior state decoding
(reference workflow_posterior.py)."""

from __future__ import annotations

from itrails_tpu.cli import decode


def main(argv=None):
    decode.decode_main(
        argv,
        "Posterior workflow using iTRAILS-TPU",
        usage=("itrails-tpu-posterior --config-file CONFIG_FILE --input "
               "PATH_MAF --output OUTPUT_PATH --PARAMETERS"),
        introgression=False,
        posterior=True,
    )


if __name__ == "__main__":
    main()
