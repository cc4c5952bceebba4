#!/bin/bash
# Build N Betaflight SITL executables for BetaAviary, one per drone, each on
# its own UDP port block (PWM 90i2 / STATE 90i3 / RC 90i4 — the wire contract
# in gym_pybullet_drones_tpu/envs/beta.py and bridges/betaflight/).
#
# TPU-repo port of the reference workflow (assets/clone_bfs.sh): clone the
# Betaflight source at the pinned revision, disable the SITL scheduler's
# 20 kHz real-time sleep, rewrite the per-instance UDP ports, build
# TARGET=SITL, and install a flight-controller configuration blob
# (eeprom.bin) next to each binary.
#
# Requires: git, make, gcc, network access. Run OUTSIDE the sandboxed build
# image (it has zero egress). Usage:
#   build_betaflight_sitl.sh <num_drones> [--dest DIR] [--eeprom FILE] [--rev REV]
#
# The eeprom blob carries the arming/rate/PID profile the env expects
# (aux1 arm switch on channel 5, rate profile matching ctbr2beta's
# MAX_RATE=360 deg/s). Create one with betaflight-configurator against a
# SITL instance (it writes eeprom.bin in the working directory), or pass an
# existing blob with --eeprom.

set -euo pipefail

NUM="${1:?usage: build_betaflight_sitl.sh <num_drones> [--dest DIR] [--eeprom FILE] [--rev REV]}"
shift
DEST="betaflight_sitl"
EEPROM=""
REV="cafe727"   # revision the wire protocol was validated against (BF 4.5-dev)
while [ $# -gt 0 ]; do
  case "$1" in
    --dest) DEST="$2"; shift 2 ;;
    --eeprom) EEPROM="$2"; shift 2 ;;
    --rev) REV="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done

mkdir -p "$DEST"
cd "$DEST"

if [ ! -d src-clone ]; then
  git clone https://github.com/betaflight/betaflight src-clone
fi
git -C src-clone checkout "$REV"

# The SITL main loop sleeps 50 us per iteration to cap itself at 20 kHz wall
# clock; lockstep simulation wants it free-running.
sed -i 's/^\([[:space:]]*\)delayMicroseconds_real(50);/\1\/\/delayMicroseconds_real(50); \/\/ free-run for lockstep sim/' \
  src-clone/src/main/main.c

for i in $(seq 0 $((NUM - 1))); do
  d="bf${i}"
  rm -rf "$d"
  cp -r src-clone "$d"
  sitl="$d/src/main/target/SITL/sitl.c"
  # Per-instance UDP port block: drone i listens/talks on 9001+10i..9004+10i
  # (the env binds 9002+10i / sends to 9003+10i, 9004+10i — envs/beta.py).
  # Computed arithmetically so indices >= 10 stay valid ports.
  sed -i "s/PORT_PWM_RAW\([[:space:]]*\)9001/PORT_PWM_RAW\1$((9001 + 10 * i))/" "$sitl"
  sed -i "s/PORT_PWM\([[:space:]]*\)9002/PORT_PWM\1$((9002 + 10 * i))/" "$sitl"
  sed -i "s/PORT_STATE\([[:space:]]*\)9003/PORT_STATE\1$((9003 + 10 * i))/" "$sitl"
  sed -i "s/PORT_RC\([[:space:]]*\)9004/PORT_RC\1$((9004 + 10 * i))/" "$sitl"
  make -C "$d" TARGET=SITL -j"$(nproc)"
  if [ -n "$EEPROM" ]; then
    cp "$EEPROM" "$d/eeprom.bin"
  else
    echo "[WARN] no --eeprom given: configure bf${i} once via betaflight-configurator (it writes eeprom.bin)"
  fi
  echo "[OK] $d/obj/main/betaflight_SITL.elf"
done

echo "Run BetaAviary with:"
echo "  python -m gym_pybullet_drones_tpu.examples.beta --num_drones $NUM \\"
echo "      --sitl_dir $DEST"
