classdef Layer < handle
  % caffe.Layer — a layer's learned blobs and type.

  properties (Access = private)
    h
  end
  properties (SetAccess = private)
    params
  end

  methods
    function self = Layer(h)
      CHECK(is_valid_handle(h), 'invalid Layer handle');
      self.h = h;
      a = caffe_('layer_get_attr', self.h);
      if isempty(a.hBlob_blobs)
        self.params = caffe.Blob.empty();
      else
        self.params = arrayfun(@(hh) caffe.Blob(hh), a.hBlob_blobs);
      end
    end

    function t = type(self)
      t = caffe_('layer_get_type', self.h);
    end
  end
end
