"""Generate the round-5 DeepStab-sized rich dataset: 61 pairs (the real
DeepStab's size), full scene model incl. the new motion-blur +
exposure-step stressors and pan-anchored occluders."""
import sys, time
from pwstablenet_tpu.data.deepstab import write_synthetic_deepstab

out = sys.argv[1]
t0 = time.time()
write_synthetic_deepstab(out, num_pairs=61, frames=64, height=320,
                         width=448, seed=5, rich=True)
print(f"done in {time.time()-t0:.0f}s", flush=True)
