classdef Net < handle
  % caffe.Net — MATLAB view of a bridge-side net (the reference API,
  % matlab/+caffe/Net.m, over the RPC dispatch instead of a MEX).
  %
  %   net = caffe.Net('model.prototxt', 'test');
  %   out = net.forward({in1, in2});
  %   net.blobs('conv1').get_data()

  properties (Access = private)
    h       % bridge handle struct (ptr, init_key)
    attr    % net_get_attr result
  end
  properties (SetAccess = private)
    layer_vec
    blob_vec
    inputs
    outputs
    layer_names
    blob_names
  end

  methods
    function self = Net(varargin)
      if ~(nargin == 1 && isstruct(varargin{1}))
        self = caffe.get_net(varargin{:});
        return
      end
      self.h = varargin{1};
      CHECK(is_valid_handle(self.h), 'invalid Net handle');
      self.attr = caffe_('net_get_attr', self.h);
      self.layer_names = cellstr(string(self.attr.layer_names));
      self.blob_names = cellstr(string(self.attr.blob_names));
      self.layer_vec = arrayfun(@(hh) caffe.Layer(hh), ...
                                self.attr.hLayer_layers);
      self.blob_vec = arrayfun(@(hh) caffe.Blob(hh), ...
                               self.attr.hBlob_blobs);
      self.inputs = self.blob_names(self.attr.input_blob_indices + 1);
      self.outputs = self.blob_names(self.attr.output_blob_indices + 1);
    end

    function layer = layers(self, name)
      layer = self.layer_vec(strcmp(self.layer_names, name));
    end

    function blob = blobs(self, name)
      blob = self.blob_vec(strcmp(self.blob_names, name));
    end

    function blob = params(self, layer_name, blob_index)
      blob = self.layers(layer_name).params(blob_index);
    end

    function forward_prefilled(self)
      caffe_('net_forward', self.h);
    end

    function backward_prefilled(self)
      caffe_('net_backward', self.h);
    end

    function res = forward(self, input_data)
      CHECK(iscell(input_data), 'input_data must be a cell array');
      for n = 1:numel(self.inputs)
        self.blobs(self.inputs{n}).set_data(input_data{n});
      end
      self.forward_prefilled();
      res = cellfun(@(nm) self.blobs(nm).get_data(), ...
                    self.outputs, 'UniformOutput', false);
    end

    function res = backward(self, output_diff)
      CHECK(iscell(output_diff), 'output_diff must be a cell array');
      for n = 1:numel(self.outputs)
        self.blobs(self.outputs{n}).set_diff(output_diff{n});
      end
      self.backward_prefilled();
      res = cellfun(@(nm) self.blobs(nm).get_diff(), ...
                    self.inputs, 'UniformOutput', false);
    end

    function copy_from(self, weights_file)
      caffe_('net_copy_from', self.h, weights_file);
    end

    function reshape(self)
      caffe_('net_reshape', self.h);
    end

    function save(self, weights_file)
      caffe_('net_save', self.h, weights_file);
    end
  end
end
