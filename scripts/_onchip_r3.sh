#!/bin/bash
# Round-3 on-chip measurement pass. Waits for the pytest run to finish
# (host CPU is single-core; never overlap TPU sweeps with the suite) and
# for the axon tunnel to come back, then measures everything in sequence.
cd /root/repo
log=/tmp/onchip_r3.log
echo "=== onchip_r3 start $(date) ===" > "$log"

# 1. wait for pytest to finish
while kill -0 "$(cat /tmp/pytest.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "pytest done: $(tail -1 /tmp/pytest_r3.log)" >> "$log"

# 2. wait for the tunnel (poller writes UP to /tmp/tpu_status and exits;
#    if the poller died, probe directly)
until grep -q UP /tmp/tpu_status 2>/dev/null; do
  if ! kill -0 "$(cat /tmp/tpu_poll.pid 2>/dev/null)" 2>/dev/null; then
    timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('UP')" > /tmp/tpu_status 2>&1 || true
  fi
  sleep 60
done
echo "tpu up $(date)" >> "$log"

# 3. VAE decode sweep: XLA baseline, fused-pallas variants, encode pair.
#    fc1u1 establishes the parity ref; *p specs check err vs it.
timeout 10800 python _vae_decode_sweep.py encode fc1u1 fc4u1 fc7u1 fc1u1p \
  >> "$log" 2>&1
echo "--- sweep done $(date) ---" >> "$log"

# 4. conv micro-bench (fused kernel vs XLA formulations)
timeout 1800 python _vae_conv_bench.py >> "$log" 2>&1 || true
echo "--- conv bench done $(date) ---" >> "$log"

# 5. DiT step A/B variants (fused-FFN kernels, bf16 residual, ctx trim)
timeout 3600 python _dit_ab.py >> "$log" 2>&1 || true
echo "--- dit ab done $(date) ---" >> "$log"

# 5b. DiT step op-profile (VERDICT item 9 remainder analysis)
timeout 1800 python _dit_profile.py >> "$log" 2>&1 || true
echo "--- dit profile done $(date) ---" >> "$log"

# 6. driver bench
timeout 1800 python bench.py >> "$log" 2>&1 || true
echo "=== onchip_r3 complete $(date) ===" >> "$log"
