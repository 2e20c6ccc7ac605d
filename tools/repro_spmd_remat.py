"""Reproduce the dp x sp involuntary-full-rematerialization warning
(MULTICHIP_r03.json tail) locally: runs __graft_entry__.dryrun_multichip
on 8 virtual CPU devices and surfaces the SPMD warnings."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "0")

import __graft_entry__

__graft_entry__.dryrun_multichip(8)
