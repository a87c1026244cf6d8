"""Try jax.profiler on the axon backend: trace one UNet forward and dump
op-level events. If device tracing is unsupported we find out cheaply."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    gp = g.init_params(jax.random.PRNGKey(0))
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, "a highly detailed hamburger")
    ctx = jnp.concatenate([emb["uncond"], emb["default"]]).astype(jnp.float32)
    gp = jax.device_put(gp)

    @jax.jit
    def unet_fwd(gp, lat, t, ctx):
        x_in = jnp.concatenate([lat] * 2)
        t_in = jnp.concatenate([t] * 2)
        eps = g.unet.apply({"params": gp["unet"]}, x_in, t_in, ctx)
        return jnp.sum(eps.astype(jnp.float32))

    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 4),
                            jnp.bfloat16)
    t = jnp.full((1,), 500)
    out = unet_fwd(gp, lat, t, ctx)
    jax.block_until_ready(out)

    trace_dir = "/tmp/dftpu_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            lat2 = lat + i * 1e-3
            out = unet_fwd(gp, lat2, t, ctx)
        jax.block_until_ready(out)

    # find trace.json.gz and summarize device op durations
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        print("NO TRACE FILES — profiler unsupported on this backend?")
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # aggregate complete events by name on device tracks
    from collections import defaultdict
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pid_names.get(e.get("pid"), "")
            if "TPU" in pname or "tpu" in pname or "Device" in pname \
                    or "/device" in pname.lower():
                agg[e["name"]] += e["dur"]
                cnt[e["name"]] += 1
    if not agg:
        print("no device-track events; process names:",
              sorted(set(pid_names.values())))
        # fall back: dump top complete events anywhere
        for e in sorted([e for e in events if e.get("ph") == "X"],
                        key=lambda e: -e.get("dur", 0))[:30]:
            print(f"{e.get('dur',0)/1e3:9.2f}ms  pid={e.get('pid')} "
                  f"{e.get('name','')[:90]}")
        return
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(agg.values())
    print(f"total device us: {tot:.0f}")
    for name, us in top:
        print(f"{us/1e3:9.2f}ms  x{cnt[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
