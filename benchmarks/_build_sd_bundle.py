"""Build the random-weight SD1.5 featurizer bundle for bench_pipeline,
ON CPU, in a subprocess: the bench driver must never touch the TPU
backend itself — its CLI phases are TPU subprocesses, and the axon
tunnel serves ONE process at a time (the round-5 pipeline run failed
exactly this way: the driver jitted the bundle init on-chip at startup
and the first extract-features subprocess wedged against it).

Usage: python -m benchmarks._build_sd_bundle <out.npz>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from law_of_vision_representation_in_mllms_tpu.core.precision import (  # noqa: E402,E501
    BF16_TOWER_PRECISION)
from law_of_vision_representation_in_mllms_tpu.io.featurizer_bundle import (  # noqa: E402,E501
    save_featurizer_bundle)
from law_of_vision_representation_in_mllms_tpu.models import (  # noqa: E402
    featurizer as F, unet as UN, vae as VA)


def main(out_path: str) -> None:
    fcfg = F.FEATURIZER_PRESETS["runwayml/stable-diffusion-v1-5"]()
    rng0 = jax.random.PRNGKey(0)
    px1 = jnp.zeros((1, fcfg.img_size, fcfg.img_size, 3), jnp.float32)
    lat = fcfg.img_size // (2 ** (len(fcfg.vae.block_out_channels) - 1))
    latents = jnp.zeros((1, lat, lat, fcfg.vae.latent_channels),
                        jnp.bfloat16)
    ctx = jnp.zeros((1, 77, fcfg.unet.cross_attention_dim), jnp.bfloat16)
    prec_t = BF16_TOWER_PRECISION
    params = {
        "vae": jax.jit(VA.VAEEncoder(fcfg.vae, prec_t).init)(
            rng0, px1)["params"],
        "backbone": jax.jit(UN.UNetHarvest(
            fcfg.unet, (fcfg.up_ft_index,), prec_t).init)(
            rng0, latents, 1, ctx)["params"],
        "prompt_embeds": np.zeros((1, 77, fcfg.unet.cross_attention_dim),
                                  np.float32),
    }
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    save_featurizer_bundle(out_path, params, fcfg)


if __name__ == "__main__":
    main(sys.argv[1])
