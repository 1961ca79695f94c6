"""``itrails-tpu-int-optimize``: introgression-model parameter inference
(reference workflow_int_optimize.py)."""

from __future__ import annotations

import os

from itrails_tpu import __version__
from itrails_tpu.cli.common import (
    prepare_optimize_setup,
    resolve_io,
    resolve_optim_method,
    standard_parser,
)
from itrails_tpu.config import load_config, seed_best_model, write_starting_params
from itrails_tpu.data.maf import maf_tokens
from itrails_tpu.optim.optimizer import optimizer


def main(argv=None):
    parser = standard_parser(
        "Introgression optimize workflow using iTRAILS-TPU",
        usage="itrails-tpu-int-optimize <config.yaml> --output OUTPUT_PATH",
    )
    parser.add_argument("--version", action="version",
                        version=f"%(prog)s {__version__}")
    parser.add_argument("--maxiter", type=int, default=None,
                        help="Optimizer iteration cap (overrides the "
                             "settings.maxiter config key; default 10000).")
    parser.add_argument("--precision", choices=["float32", "float64"],
                        default="float64")
    parser.add_argument("--grad", action="store_true",
                        help="Force the exact-gradient path (reverse-mode "
                             "AD, L-BFGS-B).  This is already the default "
                             "unless the config sets settings.method: "
                             "Nelder-Mead explicitly.")
    parser.add_argument("--no-grad", action="store_true",
                        help="Disable the exact-gradient path: run the "
                             "reference's derivative-free algorithm "
                             "(settings.method, default Nelder-Mead).")
    args = parser.parse_args(argv)

    config = load_config(args.config_file)
    maf_path, user_output, output_dir, output_prefix = resolve_io(config, args)
    setup = prepare_optimize_setup(config, introgression=True)
    settings = dict(setup["settings"])
    settings["output_prefix"] = user_output
    settings["input_maf"] = maf_path

    write_starting_params(
        os.path.join(output_dir, f"{output_prefix}_starting_params.yaml"),
        setup["descaled_fixed"], setup["descaled_bounds"], settings,
    )
    seed_best_model(
        os.path.join(output_dir, f"{output_prefix}_best_model.yaml"),
        setup["descaled_fixed"], settings,
    )

    print("Reading MAF alignment file.")
    v_lst = maf_tokens(maf_path, settings["species_list"])
    if not v_lst:
        raise ValueError("Error reading MAF alignment file.")

    use_grad, method = resolve_optim_method(setup, args.grad, args.no_grad)
    print(f"Running optimization ({method}"
          f"{', exact gradients' if use_grad else ''})...")
    optimizer(
        optim_variables=setup["optim_variables"],
        optim_list=setup["optim_list"],
        bounds=setup["bounds_list"],
        fixed_params=setup["fixed_dict"],
        v_lst=v_lst,
        res_name=user_output,
        case=setup["case"],
        method=method,
        maxiter=(args.maxiter if args.maxiter is not None
                 else int(settings.get("maxiter") or 10000)),
        dtype=args.precision,
        introgression=True,
        use_grad=use_grad,
    )
    print("Optimization complete.")


if __name__ == "__main__":
    main()
