"""Static consistency of the shipped pure-.m MATLAB client vs MatBridge.

MATLAB does not exist in this sandbox, so ``matlab/+caffe/*.m`` cannot be
executed here (the bridge + wire protocol ARE executed, from Python, in
test_matcaffe.py).  What CAN be pinned statically is the contract between
the two sides: every ``caffe_('<cmd>', ...)`` the client emits must have a
``cmd_<cmd>`` handler on MatBridge, and every handler the bridge exposes
must be reachable from the shipped client — otherwise the 29-command MEX
surface (reference matlab/+caffe/private/caffe_.cpp:528-560) has silently
drifted on one side.
"""

import re
from pathlib import Path

import pytest

from mms_answer_selection_tpu.matcaffe import MatBridge

REPO = Path(__file__).resolve().parent.parent
MATLAB = REPO / "matlab"

# 'connect' is client-local (caffe_.m opens the TCP socket and returns
# before any request is written); it never reaches the bridge.
CLIENT_LOCAL = {"connect"}

_CALL = re.compile(r"caffe_\(\s*'([a-z_]+)'")


def _client_commands():
    cmds = set()
    for m_file in sorted(MATLAB.rglob("*.m")):
        cmds |= set(_CALL.findall(m_file.read_text()))
    return cmds


def _bridge_commands():
    return {name[len("cmd_"):] for name in dir(MatBridge)
            if name.startswith("cmd_")}


def test_matlab_tree_ships():
    assert (MATLAB / "+caffe" / "private" / "caffe_.m").is_file()
    assert (MATLAB / "+caffe" / "Net.m").is_file()


def test_every_client_command_has_a_bridge_handler():
    missing = _client_commands() - CLIENT_LOCAL - _bridge_commands()
    assert not missing, (
        f"matlab/+caffe calls commands the bridge does not implement: "
        f"{sorted(missing)}")


def test_every_bridge_command_is_reachable_from_the_client():
    unused = _bridge_commands() - _client_commands()
    assert not unused, (
        f"MatBridge exposes commands no shipped .m file ever sends "
        f"(client drift or dead surface): {sorted(unused)}")


def test_surface_size_matches_the_reference_mex():
    # caffe_.cpp's handler table has 29 entries; 'connect' is this
    # rebuild's one addition (the MEX boundary became an RPC boundary).
    assert len(_bridge_commands()) == 29


def test_m_definitions_match_file_names():
    """MATLAB resolves a file's main function/classdef by file name; a
    mismatch is a silently-broken client file."""
    for m_file in sorted((MATLAB / "+caffe").rglob("*.m")):
        head = ""
        for line in m_file.read_text().splitlines():
            s = line.strip()
            if not s or s.startswith("%"):
                continue
            head = s
            break
        m = re.match(
            r"(?:classdef\s+(\w+)"
            r"|function\s+(?:[\w\[\],\s]+=\s*)?(\w+)\s*[\(\n%]?)", head)
        assert m, f"{m_file}: no function/classdef header found: {head!r}"
        name = m.group(1) or m.group(2)
        assert name == m_file.stem, (
            f"{m_file.name} defines '{name}' (must match the file name)")


def test_dispatch_rejects_connect():
    # if a client ever relays 'connect' to the daemon, fail loudly
    # instead of binding a second socket server-side.
    with pytest.raises(ValueError, match="Unknown command"):
        MatBridge()("connect")
