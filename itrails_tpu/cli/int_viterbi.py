"""``itrails-tpu-int-viterbi``: introgression-model gene-tree decoding
(reference workflow_int_viterbi.py)."""

from __future__ import annotations

import os

from itrails_tpu import __version__
from itrails_tpu.cli import decode
from itrails_tpu.cli.common import standard_parser
from itrails_tpu.config import load_config


def main(argv=None):
    parser = standard_parser(
        "Introgression viterbi workflow using iTRAILS-TPU",
        usage="itrails-tpu-int-viterbi <config.yaml> --output OUTPUT_PATH",
    )
    parser.add_argument("--version", action="version",
                        version=f"%(prog)s {__version__}")
    parser.add_argument("--precision", choices=["float32", "float64"],
                        default="float64")
    args = parser.parse_args(argv)

    config = load_config(args.config_file)
    setup, v_lst, coords, output_dir, output_prefix = decode.load_inputs(
        config, args, introgression=True
    )
    print("Calculating transition and emission probability matrices.")
    model, a, bfull, pi = decode.build(setup, args.precision)
    decode.write_hidden_states(
        os.path.join(output_dir, f"{output_prefix}.hidden_states.csv"),
        model, setup, first_interval_from_ab=False,
    )
    print("Running viterbi.")
    results = decode.run_viterbi(a, bfull, pi, v_lst)
    decode.write_viterbi_csv(
        os.path.join(output_dir, f"{output_prefix}.viterbi.csv"), results, coords
    )


if __name__ == "__main__":
    main()
