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
# MAX_RATE=360 deg/s). Without --eeprom this script GENERATES one (round 4,
# no GUI needed): it boots the first built binary, drives its TCP CLI with
# scripts/configure_sitl.py (the MockSITL profile / reference preset), and
# lets the firmware save its own byte-exact eeprom.bin, which is then
# installed next to every binary. Pass --eeprom FILE to use an existing
# blob instead; --no-configure restores the round-3 warn-only behavior.

set -euo pipefail

NUM="${1:?usage: build_betaflight_sitl.sh <num_drones> [--dest DIR] [--eeprom FILE] [--rev REV]}"
shift
DEST="betaflight_sitl"
EEPROM=""
CONFIGURE=1
REV="cafe727"   # revision the wire protocol was validated against (BF 4.5-dev)
SCRIPTS_DIR="$(cd "$(dirname "$0")" && pwd)"
while [ $# -gt 0 ]; do
  case "$1" in
    --dest) DEST="$2"; shift 2 ;;
    --eeprom) EEPROM="$2"; shift 2 ;;
    --rev) REV="$2"; shift 2 ;;
    --no-configure) CONFIGURE=0; shift ;;
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
  if [ -z "$EEPROM" ] && [ "$CONFIGURE" = 1 ] && [ "$i" = 0 ]; then
    # Generate the blob once from bf0: boot it, CLI-configure over TCP 5761
    # (the firmware writes its own eeprom.bin on 'save'), shut it down.
    echo "[configure] booting bf0 to generate eeprom.bin via its CLI"
    ( cd "$d" && ./obj/main/betaflight_SITL.elf >/dev/null 2>&1 & echo $! > sitl.pid )
    sleep 3
    python3 "$SCRIPTS_DIR/configure_sitl.py" --port 5761
    sleep 2
    kill "$(cat "$d/sitl.pid")" 2>/dev/null || true
    rm -f "$d/sitl.pid"
    if [ -f "$d/eeprom.bin" ]; then
      EEPROM="$d/eeprom.bin"
      echo "[configure] generated $EEPROM"
    else
      echo "[WARN] CLI configuration produced no eeprom.bin; configure manually"
    fi
  fi
  if [ -n "$EEPROM" ] && [ "$EEPROM" != "$d/eeprom.bin" ]; then
    cp "$EEPROM" "$d/eeprom.bin"
  fi
  echo "[OK] $d/obj/main/betaflight_SITL.elf"
done

echo "Run BetaAviary with:"
echo "  python -m gym_pybullet_drones_tpu.examples.beta --num_drones $NUM \\"
echo "      --sitl_dir $DEST"
