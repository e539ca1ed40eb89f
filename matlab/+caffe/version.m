function v = version()
v = caffe_('version');
end
