"""CLI entry points (the six ``itrails-tpu-*`` console scripts).

The model build is float64 end-to-end like the reference (reference
get_trans_emiss.py operates in numpy f64); without ``jax_enable_x64`` JAX
silently truncates every requested f64 to f32, degrading the build's
numerics on real hardware.  Decode precision stays an explicit per-workflow
``--precision`` choice.  Enabled here (not in the library root) so plain
library users keep JAX's default dtype semantics.
"""

import jax

jax.config.update("jax_enable_x64", True)
