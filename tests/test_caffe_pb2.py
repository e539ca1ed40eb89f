"""caffe.proto.caffe_pb2 shim (utils/caffe_pb2_shim.py): the
message-object surface ported pycaffe scripts build Datums/BlobProtos
with (python/caffe/io.py:41-97), backed by the clean-room wire codec."""

import numpy as np
import pytest

from mms_answer_selection_tpu.utils.caffe_pb2_shim import (
    TEST, TRAIN, BlobProto, BlobProtoVector, Datum, LayerParameter,
    Message, NetParameter)
from mms_answer_selection_tpu.utils.io import (array_to_datum,
                                               datum_label,
                                               datum_to_array)


class TestDatum:
    def test_build_serialize_parse(self):
        d = Datum()
        d.channels, d.height, d.width = 2, 3, 4
        d.label = 7
        d.data = bytes(range(24))
        wire = d.SerializeToString()
        d2 = Datum().ParseFromString(wire)
        assert (d2.channels, d2.height, d2.width) == (2, 3, 4)
        assert d2.label == 7
        assert d2.data == bytes(range(24))
        assert d2 == d
        # the io codec reads the shim's bytes
        np.testing.assert_array_equal(
            datum_to_array(wire),
            np.arange(24, dtype=np.uint8).reshape(2, 3, 4))
        assert datum_label(wire) == 7

    def test_float_data_repeated(self):
        d = Datum(channels=1, height=1, width=3)
        d.float_data.append(1.5)
        d.float_data.extend([2.5, -3.0])
        assert list(d.float_data) == [1.5, 2.5, -3.0]
        arr = datum_to_array(d)  # message object accepted directly
        np.testing.assert_allclose(arr, [[[1.5, 2.5, -3.0]]])

    def test_defaults_and_presence(self):
        d = Datum()
        assert d.label == 0 and d.data == b"" and d.encoded is False
        assert not d.HasField("label")
        d.label = 0
        assert d.HasField("label")
        d.ClearField("label")
        assert not d.HasField("label")

    def test_array_to_datum_quacks_like_message(self):
        """The reference idiom: `datum = caffe.io.array_to_datum(arr, i);
        txn.put(key, datum.SerializeToString())` — and attribute reads."""
        arr = np.arange(6, dtype=np.uint8).reshape(1, 2, 3)
        datum = array_to_datum(arr, 5)
        assert datum.SerializeToString() == bytes(datum)
        assert datum.label == 5
        assert (datum.channels, datum.height, datum.width) == (1, 2, 3)
        np.testing.assert_array_equal(datum_to_array(datum), arr)

    def test_unknown_field_raises(self):
        with pytest.raises(AttributeError, match="no field"):
            Datum().bogus = 1


class TestBlobProto:
    def test_shape_and_data(self):
        b = BlobProto()
        b.shape.dim.extend([2, 3])
        b.data.extend([float(x) for x in range(6)])
        wire = b.SerializeToString()
        b2 = BlobProto().ParseFromString(wire)
        assert list(b2.shape.dim) == [2, 3]
        assert list(b2.data) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]

    def test_submessage_read_is_not_presence(self):
        """proto2: reading an unset sub-message must not mark it set."""
        b = BlobProto()
        assert list(b.shape.dim) == []        # read only
        assert b.SerializeToString() == b""   # nothing materialized
        b.shape.dim.append(4)                 # first write attaches
        assert BlobProto().ParseFromString(
            b.SerializeToString()).shape.dim == [4]

    def test_vector(self):
        v = BlobProtoVector()
        one = v.blobs.add()
        one.shape.dim.append(2)
        one.data.extend([1.0, 2.0])
        v2 = BlobProtoVector().ParseFromString(v.SerializeToString())
        assert len(v2.blobs) == 1
        assert list(v2.blobs[0].data) == [1.0, 2.0]


class TestNetParameter:
    def test_build_and_run(self):
        """A NetParameter built message-style executes in GraphNet via
        the shared dict representation."""
        import jax
        import jax.numpy as jnp

        from mms_answer_selection_tpu.models.graph_net import GraphNet
        from mms_answer_selection_tpu.utils.prototxt import emit_prototxt
        from mms_answer_selection_tpu.utils.proto_wire import strip_blobs

        net = NetParameter(name="pbnet")
        la = net.layer.add(name="in", type="Input")
        la.top.append("x")
        fc = net.layer.add(name="fc", type="InnerProduct")
        fc.bottom.append("x")
        fc.top.append("y")
        fc.inner_product_param.num_output = 3
        fc.inner_product_param.weight_filler.type = "xavier"
        text = emit_prototxt(strip_blobs(net.to_dict()))
        g = GraphNet(text)
        x = jnp.ones((2, 5))
        params, state = g.init(jax.random.PRNGKey(0), {"x": x})
        blobs, _ = g.apply(params, state, {"x": x})
        assert blobs["y"].shape == (2, 3)
        # and the binary wire round-trips through the net codec
        from mms_answer_selection_tpu.utils.proto_wire import \
            decode_net_binary

        rt = decode_net_binary(net.SerializeToString())
        assert rt["name"] == "pbnet"
        assert rt["layer"][1]["inner_product_param"]["num_output"] == 3

    def test_layer_parameter_phase_enum(self):
        la = LayerParameter(name="d", type="Dropout")
        inc = la.include.add()
        inc.phase = TRAIN
        wire = la.SerializeToString()
        la2 = LayerParameter().ParseFromString(wire)
        assert la2.include[0].phase == "TRAIN"  # decoded to the NAME
        assert TRAIN == 0 and TEST == 1


class TestCompatNamespace:
    def test_proto_submodule_importable(self):
        from mms_answer_selection_tpu import caffe_compat as caffe
        from mms_answer_selection_tpu.caffe_compat.proto import caffe_pb2

        assert caffe.proto.caffe_pb2 is caffe_pb2
        d = caffe_pb2.Datum(channels=1, height=1, width=1, label=3)
        assert caffe_pb2.Datum().ParseFromString(
            d.SerializeToString()).label == 3

    def test_message_for_any_schema(self):
        from mms_answer_selection_tpu.utils.caffe_pb2_shim import \
            message_for

        conv = message_for("Convolution")(num_output=8)
        conv.kernel_size.extend([3, 5])
        rt = Message("Convolution").ParseFromString(
            conv.SerializeToString())
        assert rt.kernel_size == [3, 5] and rt.num_output == 8


class TestMessageSurfaceEdges:
    """The remaining message-API corners ported scripts hit."""

    def test_repeated_scalar_indexing_and_repr(self):
        d = Datum()
        d.float_data.extend([1.0, 2.0, 3.0])
        assert d.float_data[1] == 2.0
        d.float_data[1] = 9.0
        assert list(d.float_data) == [1.0, 9.0, 3.0]
        assert repr(d.float_data) == "[1.0, 9.0, 3.0]"
        assert "Datum" in repr(d)

    def test_repeated_scalar_direct_assignment(self):
        # net.input_dim = [1, 2, 3, 4] — whole-list assignment
        n = NetParameter()
        n.input_dim = [1, 2, 3, 4]
        assert list(n.input_dim) == [1, 2, 3, 4]

    def test_repeated_message_assignment_raises(self):
        n = NetParameter()
        with pytest.raises(AttributeError, match="add"):
            n.layer = [LayerParameter(name="x")]

    def test_repeated_message_iter_empty_and_filled(self):
        n = NetParameter()
        assert list(n.layer) == [] and len(n.layer) == 0
        n.layer.add(name="a")
        n.layer.add(name="b")
        assert [la.name for la in n.layer] == ["a", "b"]
        assert n.layer[1].name == "b"

    def test_submessage_direct_assignment(self):
        # la.convolution_param = other_msg (and a raw dict)
        src = LayerParameter(name="c", type="Convolution")
        src.convolution_param.num_output = 12
        dst = LayerParameter(name="c2", type="Convolution")
        dst.convolution_param = src.convolution_param
        assert dst.convolution_param.num_output == 12
        # deep enough: mutating dst must not change src
        dst.convolution_param.num_output = 13
        assert src.convolution_param.num_output == 12

    def test_copy_from(self):
        d = Datum(channels=2, height=1, width=1, label=5)
        d.float_data.extend([1.0, 2.0])
        e = Datum()
        e.CopyFrom(d)
        assert e == d
        e.float_data[0] = -1.0  # deep copy: d untouched
        assert d.float_data[0] == 1.0

    def test_enum_default_is_first_value(self):
        from mms_answer_selection_tpu.utils.caffe_pb2_shim import \
            message_for

        # Pooling.pool enum: MAX = 0 is the proto default
        pool = message_for("Pooling")()
        assert pool.pool == 0

    def test_decoded_over_occurrence_takes_last(self):
        # proto2 last-wins for duplicated optional fields on the wire
        d1 = Datum(label=1).SerializeToString()
        d2 = Datum(label=2).SerializeToString()
        merged = Datum().ParseFromString(d1 + d2)
        assert merged.label == 2

    def test_message_for_unknown_schema(self):
        from mms_answer_selection_tpu.utils.caffe_pb2_shim import \
            message_for

        with pytest.raises(KeyError, match="unknown"):
            message_for("NoSuchMessage")
